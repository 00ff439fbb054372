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
