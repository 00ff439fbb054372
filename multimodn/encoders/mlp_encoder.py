"""Reference path compat (``multimodn/encoders/mlp_encoder.py``)."""
from multimodn_tpu.encoders import (  # noqa: F401
    MIMIC_MLPEncoder,
    MIMICMLPEncoder,
    MLPEncoder,
    MLPFeatureEncoder,
)
