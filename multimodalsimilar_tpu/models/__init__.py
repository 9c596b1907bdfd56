from multimodalsimilar_tpu.models.bert import BertConfig, BertEncoderModel
