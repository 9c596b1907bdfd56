"""Image-tower throughput shootout on the attached TPU chip.

Measures CvImageClassifier.predict_emb (backbone + 512-d neck, bf16
inference policy, BN folded where the backbone has BN) for any
name-string backbone at any resolution — the apples-to-apples comparison
behind PERF.md's tower table (B4 is VPU-bound; ViT wins at 224 but loses
its edge at 384/512 as attention grows quadratically in tokens; ConvNeXt
is the linear-in-pixels MXU tower for CNN-native resolutions).

Run:  python benchmarks/image_towers.py [spec ...]
  spec = backbone@size[:batch], e.g. convnext_tiny@384:128
Defaults compare convnext_tiny at 224/384/512 with efficientnet_b4@380.

Pool-load caveat (PERF.md top note): absolute numbers vary with the shared
pool; back-to-back runs within one invocation are the robust comparison.

Not part of bench.py's one-line contract; prints its own JSON lines.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

DEFAULTS = ["convnext_tiny@224:256", "convnext_tiny@384:128",
            "convnext_tiny@512:64", "efficientnet_b4@380:128"]


def measure(spec: str, iters: int = 5):
    import jax
    import jax.numpy as jnp

    from multimodalsimilar_tpu.models.efficientnet import EfficientNetConfig
    from multimodalsimilar_tpu.models.fold_bn import fold_cv_classifier
    from multimodalsimilar_tpu.models.vision import (
        CvImageClassifier, backbone_config)
    from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

    name, _, rest = spec.partition("@")
    size_s, _, batch_s = rest.partition(":")
    size = int(size_s)
    batch = int(batch_s) if batch_s else 128

    cfg = backbone_config(name)
    if hasattr(cfg, "resolution") and cfg.resolution != size:
        import dataclasses
        cfg = dataclasses.replace(cfg, resolution=size)
    model = CvImageClassifier(cfg, num_labels=4181, fc_dim=512,
                              policy=DTypePolicy.inference())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, size, size, 3))
                    .astype(np.float32))
    variables = jax.jit(lambda im: model.init(
        {"params": jax.random.key(0)}, im,
        label=jnp.zeros(im.shape[0], jnp.int32)))(x[:1])
    if isinstance(cfg, EfficientNetConfig):
        fcfg, variables = fold_cv_classifier(jax.device_get(variables), cfg)
        variables = jax.device_put(variables)
        model = CvImageClassifier(fcfg, num_labels=4181, fc_dim=512,
                                  policy=DTypePolicy.inference())
    run = jax.jit(lambda v, im: model.apply(v, im,
                                            method=model.predict_emb))
    for _ in range(2):
        np.asarray(run(variables, x)).sum()   # warmup + honest readback
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(variables, x)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    return {"backbone": name, "size": size, "batch": batch,
            "ms_per_batch": round(dt * 1e3, 1),
            "img_per_s": round(batch / dt, 1)}


def main(specs):
    from multimodalsimilar_tpu.cli import _enable_compile_cache
    _enable_compile_cache()
    for spec in specs or DEFAULTS:
        print(json.dumps(measure(spec)), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
