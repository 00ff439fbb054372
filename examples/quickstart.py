"""Quick start: Titanic survival with sequential multimodal fusion.

Run:  python examples/quickstart.py
Uses the real data/titanic/titanic.csv when present (fetch with
data/titanic/get_data.sh), otherwise the deterministic synthetic stand-in.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from multimodn_tpu import (
    Adam,
    InferenceSession,
    MultiModN,
    MultiModNHistory,
    export_model,
    load_model,
)
from multimodn_tpu.data import ArrayLoader, TitanicDataset
from multimodn_tpu.decoders import LogisticDecoder
from multimodn_tpu.encoders import MLPEncoder


def main():
    features = ["Fare", "Pclass", "Age", "Sex_male", "Relatives", "Embarked"]
    dataset = TitanicDataset(features, ["Survived"]).partition_dataset()
    train, val, _ = dataset.random_split((0.8, 0.2, 0), seed=0,
                                         balanced_target_idx=0)

    model = MultiModN(
        state_size=1,
        encoders=[MLPEncoder(1, len(features), (5, 5))],
        decoders=[LogisticDecoder(1)],
        err_penalty=0.7, state_change_penalty=0.3)
    history = MultiModNHistory(["Survived"])

    # 300 train+val epochs in ONE device dispatch.
    model.fit(ArrayLoader(train, 32), Adam(0.01), "cross_entropy",
              epochs=300, history=history, val_loader=ArrayLoader(val, 32))

    f1, auroc, acc, *_ = model.test(ArrayLoader(val, 32), "cross_entropy")[0]
    print(f"val f1={f1:.3f} auroc={auroc:.3f} acc={acc:.3f}")
    history.print_results()

    # Real-time serving: predictions refresh as each modality arrives.
    session = InferenceSession(model)
    x = np.asarray([s[0][0] for s in (val[i] for i in range(4))],
                   dtype=np.float32)
    state = session.init(4)
    print("prior probs:", session.decode(state)[0][:, 1])
    state, probs = session.step(state, 0, x)
    print("after tabular modality:", probs[0][:, 1])

    # Pickle-free deployment artifact.
    export_model(model, "/tmp/titanic_artifact")
    reloaded = load_model("/tmp/titanic_artifact")
    print("artifact round-trip OK:",
          np.allclose(reloaded.predict_proba([x])[0],
                      model.predict_proba([x])[0]))


if __name__ == "__main__":
    main()
