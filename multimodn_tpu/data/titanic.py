"""Titanic dataset with the reference's exact preprocessing.

Mirrors ``datasets/titanic/titanic_dataset.py``: load CSV -> preprocessing
(Relatives = SibSp+Parch; one-hot Sex with drop-first; ordinal Cabin_num;
Embarked -> {S:0, C:1, Q:2}) -> optional dropna -> optional StandardScaler on
features only -> X/y arrays, with ``partition_dataset`` / ``featurewise_dataset``
/ ``split_dataset`` converters.

Data file: ``data/titanic/titanic.csv`` under the repo root (same location the
reference's ``get_data.sh`` fetches to). When absent, a deterministic
schema-exact synthetic stand-in is generated (this environment has no network;
see ``multimodn_tpu.data.synth.synthetic_titanic``) — pass
``allow_synthetic=False`` to require the real file.
"""
from __future__ import annotations

import os
from itertools import accumulate
from typing import List, Optional

import numpy as np
import pandas as pd

from multimodn_tpu.data.dataset import FeatureWiseDataset, PartitionDataset
from multimodn_tpu.data.synth import synthetic_titanic

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "../.."))
DEFAULT_DATA_PATH = os.path.join(_REPO_ROOT, "data", "titanic", "titanic.csv")


def titanic_preprocessing(df: pd.DataFrame) -> pd.DataFrame:
    """Reference feature engineering (``titanic_dataset.py:69-79``)."""
    aug = df.copy()
    aug["Relatives"] = aug["SibSp"] + aug["Parch"]
    aug = pd.get_dummies(aug, columns=["Sex"], drop_first=True)
    cabin_mapping = {cabin: i for i, cabin in
                     enumerate(sorted(aug["Cabin"].dropna().unique()))}
    aug["Cabin_num"] = aug["Cabin"].map(cabin_mapping)
    aug["Embarked"] = aug["Embarked"].map({"S": 0, "C": 1, "Q": 2})
    return aug


class TitanicDataset:
    def __init__(
        self,
        features: List[str],
        targets: List[str],
        dropna: bool = True,
        dropna_columns: Optional[List[str]] = None,
        std: bool = True,
        data_path: Optional[str] = None,
        allow_synthetic: bool = True,
    ):
        dropna_columns = dropna_columns or []
        path = data_path or DEFAULT_DATA_PATH
        if os.path.exists(path):
            df = pd.read_csv(path)
        elif allow_synthetic:
            df = synthetic_titanic()
        else:
            raise FileNotFoundError(
                f"Titanic CSV not found at {path}; fetch it or pass "
                "allow_synthetic=True")
        df = df.set_index("PassengerId")
        df["id"] = df.index
        aug = titanic_preprocessing(df)
        aug = aug[list(set(features + targets + dropna_columns))]
        if dropna:
            aug = aug.dropna()
        aug = aug[features + targets]
        if std:
            from sklearn.preprocessing import StandardScaler
            std_df = pd.DataFrame(
                StandardScaler().fit_transform(aug[features].astype(float)),
                columns=features, index=aug.index)
            std_df[targets] = aug[targets]
            aug = std_df
        self.X = aug[features].values.astype(np.float32)
        self.y = aug[targets].values

    def __len__(self):
        return len(self.y)

    def __getitem__(self, idx: int):
        return self.X[idx], self.y[idx]

    def partition_dataset(self, partitions: Optional[List[int]] = None
                          ) -> PartitionDataset:
        return PartitionDataset(self.X, self.y, partitions)

    def featurewise_dataset(self) -> FeatureWiseDataset:
        return FeatureWiseDataset(self.X, self.y)

    def split_dataset(self, partitions: Optional[List[int]] = None
                      ) -> List[PartitionDataset]:
        from multimodn_tpu.data.dataset import split_into_partition_datasets
        return split_into_partition_datasets(self.X, self.y, partitions)
