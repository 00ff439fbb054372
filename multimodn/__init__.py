"""Drop-in import compatibility with the reference package layout
(``multimodn/``): re-exports the multimodn_tpu implementations under the
reference's module paths so existing user code's import lines keep working.
"""
from multimodn_tpu import MultiModN, MultiModNHistory
from multimodn_tpu.core.state import InitState, StaticInitState, TrainableInitState

__all__ = ["MultiModN", "MultiModNHistory", "InitState",
           "TrainableInitState", "StaticInitState"]
