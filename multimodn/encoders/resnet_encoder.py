"""Reference path compat (``multimodn/encoders/resnet_encoder.py``)."""
from multimodn_tpu.encoders.resnet import ResNet  # noqa: F401
