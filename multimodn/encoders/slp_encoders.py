"""Reference path compat (``multimodn/encoders/slp_encoders.py``)."""
from multimodn_tpu.encoders import (  # noqa: F401
    LinearEncoder,
    LogisticEncoder,
    SLPEncoder,
)
