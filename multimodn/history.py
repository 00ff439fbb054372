"""Reference path compat: ``from multimodn.history import MultiModNHistory``."""
from multimodn_tpu.core.history import MultiModNHistory, display_title  # noqa: F401
