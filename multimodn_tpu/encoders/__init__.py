from multimodn_tpu.encoders.base import MultiModEncoder
from multimodn_tpu.encoders.mlp import (
    MIMICMLPEncoder,
    MIMIC_MLPEncoder,
    MLPEncoder,
    MLPFeatureEncoder,
)
from multimodn_tpu.encoders.slp import LinearEncoder, LogisticEncoder, SLPEncoder
from multimodn_tpu.encoders.recurrent import (
    LSTMEncoder,
    LSTMFeatureEncoder,
    RNNEncoder,
    RNNFeatureEncoder,
)
from multimodn_tpu.encoders.resnet import ResNet
from multimodn_tpu.encoders.attention import TransformerEncoder, ViTEncoder

__all__ = [
    "MultiModEncoder",
    "MLPEncoder",
    "MLPFeatureEncoder",
    "MIMICMLPEncoder",
    "MIMIC_MLPEncoder",
    "SLPEncoder",
    "LinearEncoder",
    "LogisticEncoder",
    "LSTMEncoder",
    "LSTMFeatureEncoder",
    "RNNEncoder",
    "RNNFeatureEncoder",
    "ResNet",
    "TransformerEncoder",
    "ViTEncoder",
]
