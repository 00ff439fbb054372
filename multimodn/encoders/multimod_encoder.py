"""Reference path compat (``multimodn/encoders/multimod_encoder.py``)."""
from multimodn_tpu.encoders.base import MultiModEncoder  # noqa: F401
