from multimodn_tpu.data.dataset import (
    FeatureWiseDataset,
    JointDatasets,
    MultiModDataset,
    PartitionDataset,
    Subset,
)
from multimodn_tpu.data.loader import ArrayLoader, DataLoader
from multimodn_tpu.data.titanic import TitanicDataset, titanic_preprocessing
from multimodn_tpu.data.mimic import MIMICDataset, load_mimic_data
from multimodn_tpu.data.streaming import (
    StreamingLoader,
    TorchStreamingLoader,
    fit_best_streaming,
    fit_streaming,
    predict_proba_streaming,
    predict_streaming,
    test_epoch_streaming,
    train_epoch_streaming,
)
from multimodn_tpu.data.disk import CSVStreamingLoader, NpyStreamingLoader

__all__ = [
    "MultiModDataset",
    "PartitionDataset",
    "FeatureWiseDataset",
    "JointDatasets",
    "Subset",
    "ArrayLoader",
    "DataLoader",
    "TitanicDataset",
    "titanic_preprocessing",
    "MIMICDataset",
    "load_mimic_data",
    "StreamingLoader",
    "TorchStreamingLoader",
    "CSVStreamingLoader",
    "NpyStreamingLoader",
    "fit_best_streaming",
    "fit_streaming",
    "predict_proba_streaming",
    "predict_streaming",
    "test_epoch_streaming",
    "train_epoch_streaming",
]
