"""Reference path compat: ``from multimodn.state import TrainableInitState``."""
from multimodn_tpu.core.state import (  # noqa: F401
    InitState,
    StaticInitState,
    TrainableInitState,
)
