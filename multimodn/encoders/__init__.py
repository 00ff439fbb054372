"""Reference path compat: ``from multimodn.encoders import MLPEncoder``."""
from multimodn_tpu.encoders import *  # noqa: F401,F403
from multimodn_tpu.encoders import __all__  # noqa: F401
