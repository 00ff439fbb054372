"""MIMIC single-task experiment with TransformerEncoders on every source —
the beyond-reference large-encoder configuration (no reference counterpart;
encoder swap demonstrates that the experiment protocol, fused k-fold
training, and best-checkpoint selection are encoder-agnostic)."""
import sys
from os import path as o

sys.path.append(o.abspath(o.join(o.dirname(__file__), "../..")))

from pipelines.mimic.common import MimicConfig
from pipelines.mimic import mimic_single_task_pipeline


def main(argv=None):
    cfg = MimicConfig(encoder_type="transformer", dropout=0.0)
    return mimic_single_task_pipeline.main(argv=argv, cfg=cfg)


if __name__ == "__main__":
    main()
