"""Reference path compat: ``from datasets.mimic import MIMICDataset``."""
from multimodn_tpu.data.mimic import (  # noqa: F401
    MIMICDataset,
    load_mimic_data,
    source_dict,
    source_names,
    source_size,
)
