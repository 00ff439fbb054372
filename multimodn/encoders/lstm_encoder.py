"""Reference path compat (``multimodn/encoders/lstm_encoder.py``)."""
from multimodn_tpu.encoders import LSTMEncoder, LSTMFeatureEncoder  # noqa: F401
