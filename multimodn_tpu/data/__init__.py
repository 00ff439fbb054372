from multimodn_tpu.data.dataset import (
    FeatureWiseDataset,
    JointDatasets,
    MultiModDataset,
    PartitionDataset,
    Subset,
)
from multimodn_tpu.data.loader import ArrayLoader, DataLoader

__all__ = [
    "MultiModDataset",
    "PartitionDataset",
    "FeatureWiseDataset",
    "JointDatasets",
    "Subset",
    "ArrayLoader",
    "DataLoader",
]
