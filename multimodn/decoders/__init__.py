"""Reference path compat: ``from multimodn.decoders import LogisticDecoder``."""
from multimodn_tpu.decoders import *  # noqa: F401,F403
from multimodn_tpu.decoders import __all__  # noqa: F401
