from multimodalsimilar_tpu.parallel.mesh import (
    MeshRules,
    batch_sharding,
    create_mesh,
    replicated,
    shard_batch,
)
