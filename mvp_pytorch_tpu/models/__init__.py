from .config import ModelConfig, tiny_config
from .bi_encoder import BiEncoder, BiEncoderOutput
from .pretrain import BiPretrainModel, PretrainOutput
from .img_bert import (CaptioningModel, ImgBertForMultipleChoice,
                       ImgBertForPreTraining,
                       ImgBertForSequenceClassification, ImgBertModel)
from .tasks import (ClassificationModel, ClassificationPlusModel, MLMModel,
                    REModel, RepModel, RetrievalModel, VQAModel, WREModel)

__all__ = [
    "ModelConfig", "tiny_config", "BiEncoder", "BiEncoderOutput",
    "BiPretrainModel", "PretrainOutput", "CaptioningModel",
    "ImgBertForMultipleChoice", "ImgBertForPreTraining",
    "ImgBertForSequenceClassification",
    "ImgBertModel", "ClassificationModel", "ClassificationPlusModel",
    "MLMModel", "REModel", "RepModel", "RetrievalModel", "VQAModel",
    "WREModel",
]
