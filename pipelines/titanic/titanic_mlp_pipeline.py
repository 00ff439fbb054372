"""Titanic MLP pipeline — the canonical quick-start (reference
``pipelines/titanic/titanic_mlp_pipeline.py``): 6 features -> one
MLPEncoder(state=1, hidden=(5,5)) -> LogisticDecoder, 300 epochs."""
import sys
from os import path as o

sys.path.append(o.abspath(o.join(o.dirname(__file__), "../..")))

from multimodn_tpu.encoders import MLPEncoder
from pipelines.titanic.common import TitanicConfig, run

CONFIG = TitanicConfig(
    features=["Fare", "Pclass", "Age", "Sex_male", "Relatives", "Embarked"],
    make_encoders=lambda s, feats: [MLPEncoder(s, len(feats), (5, 5))],
)


def main(argv=None):
    return run(CONFIG, __file__, argv)


if __name__ == "__main__":
    main()
