"""Reference path compat (``multimodn/decoders/decoders.py``)."""
from multimodn_tpu.decoders import (  # noqa: F401
    ClassDecoder,
    LogisticDecoder,
    MLPDecoder,
)
