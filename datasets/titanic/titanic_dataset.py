"""Reference path compat (``datasets/titanic/titanic_dataset.py``)."""
from multimodn_tpu.data.titanic import (  # noqa: F401
    TitanicDataset,
    titanic_preprocessing,
)
