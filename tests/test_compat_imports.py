"""Drop-in import compatibility: the reference pipelines' exact import lines
must resolve (reference titanic_mlp_pipeline.py:9-14,
mimic_single_task_pipeline.py:13-18)."""
import numpy as np


def test_reference_import_lines_resolve():
    from multimodn.multimodn import MultiModN
    from multimodn.encoders import MLPEncoder
    from multimodn.encoders import MIMIC_MLPEncoder  # noqa: F401
    from multimodn.decoders import LogisticDecoder
    from multimodn.decoders import MLPDecoder  # noqa: F401
    from multimodn.history import MultiModNHistory
    from multimodn.state import StaticInitState, TrainableInitState  # noqa: F401
    from datasets import FeatureWiseDataset, PartitionDataset  # noqa: F401
    from datasets.titanic import TitanicDataset  # noqa: F401
    from datasets.mimic import MIMICDataset, source_dict  # noqa: F401
    from multimodn.multimodn import get_performance_metrics  # noqa: F401

    assert source_dict["vd"] == 1024
    model = MultiModN(1, [MLPEncoder(1, 6, (5, 5))], [LogisticDecoder(1)],
                      0.7, 0.3)
    history = MultiModNHistory(["Survived"])
    preds = model.predict([np.zeros((3, 6), np.float32)])
    assert preds.shape == (2, 1, 3)


def test_compute_metrics_compat():
    """Reference module-level helper (multimodn.py:51-63) importable from
    the compat path with identical scatter/NaN-fill semantics."""
    import numpy as np
    from multimodn.multimodn import compute_metrics

    E, D = 2, 2
    tp = np.zeros((E, D)); tn = np.zeros((E, D))
    fp = np.zeros((E, D)); fn = np.zeros((E, D))
    cm = np.array([[3, 1], [2, 5]])
    compute_metrics(tp, tn, fp, fn, cm, 1, 0)
    assert (tp[1][0], tn[1][0], fp[1][0], fn[1][0]) == (5, 3, 1, 2)
    compute_metrics(tp, tn, fp, fn, None, 0, 1)
    assert np.isnan(tp[0][1]) and np.isnan(fn[0][1])


def test_deep_submodule_paths():
    """The reference's full module tree resolves, not just the package
    roots: user code imports e.g. multimodn.encoders.mlp_encoder directly
    (reference file layout, SURVEY SS2.1/2.2)."""
    from multimodn.encoders.multimod_encoder import MultiModEncoder  # noqa
    from multimodn.encoders.mlp_encoder import (  # noqa: F401
        MIMIC_MLPEncoder, MLPEncoder, MLPFeatureEncoder)
    from multimodn.encoders.slp_encoders import (  # noqa: F401
        LinearEncoder, LogisticEncoder, SLPEncoder)
    from multimodn.encoders.lstm_encoder import (  # noqa: F401
        LSTMEncoder, LSTMFeatureEncoder)
    from multimodn.encoders.rnn_encoder import (  # noqa: F401
        RNNEncoder, RNNFeatureEncoder)
    from multimodn.encoders.resnet_encoder import ResNet  # noqa: F401
    from multimodn.decoders.decoders import (  # noqa: F401
        ClassDecoder, LogisticDecoder, MLPDecoder)
    from multimodn.decoders.multimod_decoder import MultiModDecoder  # noqa
    from datasets.titanic.titanic_dataset import TitanicDataset  # noqa
    from datasets.mimic.mimic_dataset import MIMICDataset  # noqa: F401
