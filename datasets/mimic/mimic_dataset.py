"""Reference path compat (``datasets/mimic/mimic_dataset.py``)."""
from multimodn_tpu.data.mimic import (  # noqa: F401
    MIMICDataset,
    load_mimic_data,
    source_dict,
    source_names,
    source_size,
)
