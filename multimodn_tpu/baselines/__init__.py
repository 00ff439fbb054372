from multimodn_tpu.baselines.haim import HAIM, HAIMDecoder

__all__ = ["HAIM", "HAIMDecoder"]
