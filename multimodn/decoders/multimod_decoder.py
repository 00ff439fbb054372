"""Reference path compat (``multimodn/decoders/multimod_decoder.py``)."""
from multimodn_tpu.decoders.base import MultiModDecoder  # noqa: F401
