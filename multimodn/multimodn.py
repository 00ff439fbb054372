"""Reference path compat: ``from multimodn.multimodn import MultiModN``."""
from multimodn_tpu import MultiModN  # noqa: F401
from multimodn_tpu.core.metrics import (  # noqa: F401
    compute_metrics,
    get_performance_metrics,
    performance_metrics,
)
