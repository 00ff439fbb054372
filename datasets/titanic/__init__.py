"""Reference path compat: ``from datasets.titanic import TitanicDataset``."""
from multimodn_tpu.data.titanic import (  # noqa: F401
    TitanicDataset,
    titanic_preprocessing,
)
