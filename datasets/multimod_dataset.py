"""Reference path compat: ``from datasets.multimod_dataset import ...``."""
from multimodn_tpu.data.dataset import (  # noqa: F401
    FeatureWiseDataset,
    JointDatasets,
    MultiModDataset,
    PartitionDataset,
    Subset,
)
