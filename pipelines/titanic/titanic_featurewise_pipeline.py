"""Titanic featurewise pipeline — one encoder per feature (reference
``titanic_featurewise_pipeline.py``): 5 MLPFeatureEncoders, state size 5."""
import sys
from os import path as o

sys.path.append(o.abspath(o.join(o.dirname(__file__), "../..")))

from multimodn_tpu.encoders import MLPFeatureEncoder
from pipelines.titanic.common import TitanicConfig, run

CONFIG = TitanicConfig(
    features=["Fare", "Pclass", "Age", "Relatives", "Embarked"],
    featurewise=True,
    state_size=5,
    make_encoders=lambda s, feats: [MLPFeatureEncoder(s, 5) for _ in feats],
)


def main(argv=None):
    return run(CONFIG, __file__, argv)


if __name__ == "__main__":
    main()
