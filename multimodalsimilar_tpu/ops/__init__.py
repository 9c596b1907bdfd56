from multimodalsimilar_tpu.ops.arcface import (
    ArcFaceParams,
    arcface_logits,
    arcface_logits_fused,
    cosine_logits,
)
