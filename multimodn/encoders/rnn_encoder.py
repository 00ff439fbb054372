"""Reference path compat (``multimodn/encoders/rnn_encoder.py``)."""
from multimodn_tpu.encoders import RNNEncoder, RNNFeatureEncoder  # noqa: F401
