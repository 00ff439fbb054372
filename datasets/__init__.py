"""Drop-in import compatibility with the reference's ``datasets`` package."""
from multimodn_tpu.data.dataset import (  # noqa: F401
    FeatureWiseDataset,
    JointDatasets,
    MultiModDataset,
    PartitionDataset,
    Subset,
)
