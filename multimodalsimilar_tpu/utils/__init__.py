from multimodalsimilar_tpu.utils.dtypes import DTypePolicy, default_policy
