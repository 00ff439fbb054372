"""Titanic partitioned pipeline — multi-encoder fusion (reference
``titanic_partitioned_pipeline.py``): 5 features in partitions [3, 2] ->
two MLPEncoders over a state of size 5."""
import sys
from os import path as o

sys.path.append(o.abspath(o.join(o.dirname(__file__), "../..")))

from multimodn_tpu.encoders import MLPEncoder
from pipelines.titanic.common import TitanicConfig, run

PARTITIONS = [3, 2]

CONFIG = TitanicConfig(
    features=["Fare", "Pclass", "Age", "Relatives", "Embarked"],
    partitions=PARTITIONS,
    state_size=5,
    make_encoders=lambda s, feats: [MLPEncoder(s, n, (5, 5))
                                    for n in PARTITIONS],
)


def main(argv=None):
    return run(CONFIG, __file__, argv)


if __name__ == "__main__":
    main()
