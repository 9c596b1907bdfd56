"""multimodalsimilar_tpu — a TPU-native multimodal product-similarity framework.

A ground-up JAX/XLA/Pallas redesign of the capabilities of
forrestsocool/MultimodalSimilar (reference at /root/reference): ArcFace
metric-learning embedding models (Chinese RoBERTa text tower, EfficientNet
image tower, two-stream fusion, hierarchical multi-label, Siamese pairs,
fastText-style baseline), data-parallel training over a TPU mesh, batched
embedding export, and an exact k-NN similarity engine replacing FAISS.

Layering (each layer only depends on the ones before it):

    utils    -> dtype policy, config, registry helpers
    parallel -> device mesh construction, sharding rules, collectives
    ops      -> Pallas/XLA kernels: fused ArcFace head, top-k similarity
    models   -> Flax modules: BERT encoder, EfficientNet, towers, heads
    data     -> tokenization, text cleaning, image decode/augment, samplers
    train    -> Trainer (optimizers, schedules, margin curriculum, ckpt)
    retrieval-> sharded exact k-NN + business-rule filters
    pipelines-> bulk/incremental embedding export, similar-item jobs, sinks
"""

__version__ = "0.1.0"
