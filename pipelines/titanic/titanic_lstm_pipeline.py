"""Titanic LSTM pipeline (reference ``titanic_lstm_pipeline.py``): a single
LSTMEncoder(state=1, hidden=(5,5)). Uses the reference-parity unbatched
recurrence mode (quirk #8)."""
import sys
from os import path as o

sys.path.append(o.abspath(o.join(o.dirname(__file__), "../..")))

from multimodn_tpu.encoders import LSTMEncoder
from pipelines.titanic.common import TitanicConfig, run

CONFIG = TitanicConfig(
    features=["Fare", "Pclass", "Age", "Sex_male", "Relatives", "Embarked"],
    make_encoders=lambda s, feats: [LSTMEncoder(s, len(feats), (5, 5))],
)


def main(argv=None):
    return run(CONFIG, __file__, argv)


if __name__ == "__main__":
    main()
