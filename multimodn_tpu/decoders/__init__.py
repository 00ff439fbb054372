from multimodn_tpu.decoders.base import MultiModDecoder
from multimodn_tpu.decoders.decoders import ClassDecoder, LogisticDecoder, MLPDecoder

__all__ = ["MultiModDecoder", "ClassDecoder", "LogisticDecoder", "MLPDecoder"]
