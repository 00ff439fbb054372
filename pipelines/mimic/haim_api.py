"""HAIM parallel-fusion baseline — pipeline-local import point matching the
reference layout (``pipelines/mimic/haim_api.py``). The implementation lives
in the framework (``multimodn_tpu.baselines.haim``)."""
from multimodn_tpu.baselines.haim import HAIM, HAIMDecoder  # noqa: F401
from multimodn_tpu.core.metrics import get_performance_metrics  # noqa: F401
