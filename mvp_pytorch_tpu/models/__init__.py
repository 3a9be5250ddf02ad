from .config import ModelConfig, tiny_config
from .bi_encoder import BiEncoder, BiEncoderOutput
from .pretrain import BiPretrainModel, PretrainOutput

__all__ = [
    "ModelConfig", "tiny_config", "BiEncoder", "BiEncoderOutput",
    "BiPretrainModel", "PretrainOutput",
]
