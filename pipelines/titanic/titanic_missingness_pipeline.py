"""Titanic missingness pipeline — NaNs kept and skipped per sample (reference
``titanic_missingness_pipeline.py``: keeps NaNs, adds the sparse Cabin_num
feature, and is forced to batch_size=1 by the reference's batch-granular NaN
skip). Here per-sample masking (``nan_skip='sample'``) removes that
restriction, so the default batch size is 32; set ``batch_size=1`` and
``nan_skip='batch'`` to replicate the reference exactly."""
import sys
from os import path as o

sys.path.append(o.abspath(o.join(o.dirname(__file__), "../..")))

from multimodn_tpu.encoders import MLPFeatureEncoder
from pipelines.titanic.common import TitanicConfig, run

FEATURES = ["Fare", "Pclass", "Age", "Relatives", "Embarked", "Cabin_num"]

CONFIG = TitanicConfig(
    features=FEATURES,
    featurewise=True,
    dropna=False,
    state_size=5,
    batch_size=32,
    epochs=40,
    nan_skip="sample",
    make_encoders=lambda s, feats: [MLPFeatureEncoder(s, 5) for _ in feats],
)


def main(argv=None):
    return run(CONFIG, __file__, argv)


if __name__ == "__main__":
    main()
