from multimodalsimilar_tpu.models.bert import BertConfig, BertEncoderModel
from multimodalsimilar_tpu.models.classifiers import (
    NlpMultilabelClassifier, NlpTextClassifier, SiamesePairModel)
from multimodalsimilar_tpu.models.efficientnet import (
    EfficientNet, EfficientNetConfig)
from multimodalsimilar_tpu.models.heads import ArcFaceHead
from multimodalsimilar_tpu.models.multimodal import MultimodalClassifier
from multimodalsimilar_tpu.models.towers import TextTower
from multimodalsimilar_tpu.models.vision import CvImageClassifier, ImageTower
