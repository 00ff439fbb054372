"""Deterministic synthetic data generators.

The reference's datasets require external files this environment cannot fetch
(Titanic CSV via wget — ``datasets/titanic/get_data.sh``; MIMIC HAIM
embeddings CSV, private — ``datasets/mimic/mimic_dataset.py:16-17``). These
generators produce schema-exact, label-correlated stand-ins so every pipeline,
test, and benchmark runs hermetically; real files slot in transparently when
present.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

# Exact HAIM source widths (reference mimic_dataset.py:19-22).
MIMIC_SOURCE_NAMES = ["de", "vd", "vmd", "ts_ce", "ts_le", "ts_pe",
                      "n_ecg", "n_ech", "n_rad"]
MIMIC_SOURCE_SIZE = [6, 1024, 1024, 99, 242, 110, 768, 768, 768]
MIMIC_SOURCE_DICT = dict(zip(MIMIC_SOURCE_NAMES, MIMIC_SOURCE_SIZE))

MIMIC_DEFAULT_TARGETS = ["Enlarged Cardiomediastinum", "Cardiomegaly"]

# Bump when synthetic_mimic_embeddings' distribution changes — keys the
# MIMIC on-disk cache (data/mimic.py) so stale frames never get served.
SYNTH_MIMIC_VERSION = 2


def synthetic_titanic(n: int = 891, seed: int = 1912) -> pd.DataFrame:
    """Titanic-schema DataFrame with realistic missingness and a learnable
    survival signal (sex/class/age/fare-driven, like the real data)."""
    rng = np.random.default_rng(seed)
    pclass = rng.choice([1, 2, 3], size=n, p=[0.24, 0.21, 0.55])
    sex = rng.choice(["male", "female"], size=n, p=[0.65, 0.35])
    age = np.clip(rng.normal(29, 14, size=n), 0.4, 80).round(1)
    sibsp = rng.choice([0, 1, 2, 3, 4], size=n, p=[0.68, 0.23, 0.05, 0.02, 0.02])
    parch = rng.choice([0, 1, 2, 3], size=n, p=[0.76, 0.13, 0.09, 0.02])
    fare = np.round(np.exp(rng.normal(2.5, 1.0, size=n)) * (4 - pclass), 4)
    embarked = rng.choice(["S", "C", "Q"], size=n, p=[0.72, 0.19, 0.09]).astype(object)

    logit = (1.3 * (sex == "female") - 0.9 * (pclass - 2)
             - 0.02 * (age - 29) + 0.004 * np.minimum(fare, 100)
             - 0.2 * (sibsp + parch > 2) + rng.normal(0, 0.8, size=n))
    survived = (logit > 0).astype(int)

    # Missingness like the real file: ~20% Age, ~77% Cabin, 2 Embarked.
    age = age.astype(object)
    age[rng.random(n) < 0.199] = np.nan
    cabin = np.array(
        ["%s%d" % (rng.choice(list("ABCDEFG")), rng.integers(1, 130))
         for _ in range(n)], dtype=object)
    cabin[rng.random(n) < 0.771] = np.nan
    embarked[rng.choice(n, size=2, replace=False)] = np.nan

    names = [f"Passenger, {'Mr.' if s == 'male' else 'Mrs.'} Synth {i}"
             for i, s in enumerate(sex)]
    tickets = [f"ST/{rng.integers(10000, 99999)}" for _ in range(n)]
    return pd.DataFrame({
        "PassengerId": np.arange(1, n + 1),
        "Survived": survived,
        "Pclass": pclass,
        "Name": names,
        "Sex": sex,
        "Age": age,
        "SibSp": sibsp,
        "Parch": parch,
        "Ticket": tickets,
        "Fare": fare,
        "Cabin": cabin,
        "Embarked": embarked,
    })


def synthetic_mimic_embeddings(
    n_patients: int = 200,
    max_stays_per_patient: int = 3,
    targets=None,
    seed: int = 2023,
    sources=None,
) -> pd.DataFrame:
    """HAIM-embeddings-shaped frame: one row per (stay, image), grouped by
    ``haim_id`` patient ids, with de_1..de_5 categorical demographics, the
    per-source embedding blocks at their exact widths, and 0/1 pathology
    target columns correlated with a low-rank latent so AUROC is learnable.

    Column layout mirrors the private ``cxr_ic_fusion_1103.csv`` consumed by
    the reference (``mimic_dataset.py:17``, widths ``:19-22``).
    """
    targets = list(targets) if targets is not None else list(MIMIC_DEFAULT_TARGETS)
    sources = list(sources) if sources is not None else list(MIMIC_SOURCE_NAMES)
    rng = np.random.default_rng(seed)

    rows_per_patient = rng.integers(1, max_stays_per_patient + 1, size=n_patients)
    n_rows = int(rows_per_patient.sum())
    haim_id = np.repeat(np.arange(n_patients), rows_per_patient)

    # Patient-level latent drives both embeddings and labels.
    latent = rng.normal(size=(n_patients, 8))
    row_latent = latent[haim_id] + 0.3 * rng.normal(size=(n_rows, 8))

    frame = {
        "haim_id": haim_id,
        "img_id": np.arange(n_rows) + 10_000,
        "img_charttime": pd.to_datetime("2140-01-01")
        + pd.to_timedelta(rng.integers(0, 10_000, size=n_rows), unit="h"),
    }
    # Demographics: 5 small categorical columns (one-hot expanded later by
    # the dataset, mirroring mimic_dataset.py:46).
    for j in range(1, 6):
        frame[f"de_{j}"] = rng.integers(0, 3, size=n_rows)

    # Per-source realism, matching two properties of the real HAIM file
    # that the MNAR protocol depends on (nips/run_mnar_protocol.py):
    # - the neural-embedding blocks (vd/vmd/n_*) are post-ReLU network
    #   activations: non-negative with positive per-feature means, so a
    #   zero-imputed block sits far outside their support (zero-fill is
    #   VISIBLE to a parallel-fusion model — the HAIM-shortcut regime);
    # - those blocks are weakly label-informative relative to the clinical
    #   time-series sources (heterogeneous SNR, like image embeddings vs
    #   charted vitals/labs for these targets).
    _EMBED_BLOCKS = {"vd", "vmd", "n_ecg", "n_ech", "n_rad"}
    for src in sources:
        if src == "de":
            continue
        width = MIMIC_SOURCE_DICT[src]
        proj = rng.normal(size=(8, width)) / np.sqrt(8)
        gain = 0.25 if src in _EMBED_BLOCKS else 1.0
        block = gain * (row_latent @ proj) \
            + 0.5 * rng.normal(size=(n_rows, width))
        if src in _EMBED_BLOCKS:
            block = np.maximum(
                block + rng.uniform(0.5, 1.5, size=width), 0.0)
        for i in range(width):
            frame[f"{src}_{i}"] = block[:, i].astype(np.float32)

    for target in targets:
        # Per-target generator seeded by the target NAME (stable crc32), so
        # a target's labels are identical whether the frame is generated for
        # that target alone or together with others — single-target datasets
        # built independently must agree with multi-target ones.
        import zlib
        t_rng = np.random.default_rng(
            (seed * 1_000_003 + zlib.crc32(target.encode())) % 2**63)
        w = t_rng.normal(size=8)
        # Label noise sized so the Bayes-optimal AUROC sits in the real
        # protocol's band (~0.8, the paper's clean-test regime) instead of
        # saturating near 1.0: with saturated content signal neither model
        # ever feels gradient pressure toward the missingness shortcuts the
        # MNAR experiment measures.
        score = row_latent @ w + 1.6 * t_rng.normal(size=n_rows)
        frame[target] = (score > np.median(score)).astype(int)

    return pd.DataFrame(frame)
