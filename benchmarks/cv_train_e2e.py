"""End-to-end CV training benchmark: is the chip fed?

Step-time metrics (PERF.md training table) exclude what the reference's
recipe actually spends much of its wall-clock on: host decode+augment and
host->device transfer. This measures wall-clock per *epoch* of the real
Trainer on synthetic 800px JPEGs for two input pipelines:

  old: float32 emission, no decode cache (round-1 behavior)
  new: uint8 emission + --decode_cache (round-2; normalize on device)

Epoch 0 of 'new' pays cache building; epochs >= 1 are the steady state the
100-epoch reference recipe (cv_classifier_train_daodian.py:50) lives in.

Run on the TPU:  python benchmarks/cv_train_e2e.py [n_images] [epochs]
Prints its own JSON lines (not part of bench.py's one-line contract).
"""

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(n=480, epochs=3, image_size=512, batch=24,
         backbone="efficientnet_b4"):
    import cv2

    from multimodalsimilar_tpu.cli import _enable_compile_cache
    _enable_compile_cache()
    import jax
    import optax
    import pandas as pd

    from multimodalsimilar_tpu.data.datasets import ImageClassificationSource
    from multimodalsimilar_tpu.models.vision import (
        CvImageClassifier, backbone_config)
    from multimodalsimilar_tpu.parallel.mesh import create_mesh
    from multimodalsimilar_tpu.train.tasks import cv_arcface_task
    from multimodalsimilar_tpu.train.trainer import Trainer, TrainerConfig

    work = tempfile.mkdtemp(prefix="cv_train_e2e_")
    img_root = os.path.join(work, "imgs")
    os.makedirs(img_root)
    rng = np.random.default_rng(0)
    for i in range(n):
        img = rng.integers(0, 255, (800, 800, 3)).astype(np.uint8)
        cv2.imwrite(os.path.join(img_root, f"{i}.jpg"), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 90])
    df = pd.DataFrame({"goods_sku": [str(i) for i in range(n)],
                       "tag_new_id": rng.integers(0, 64, n)})

    model = CvImageClassifier(backbone_config(backbone),
                              num_labels=64, fc_dim=512)
    mesh = create_mesh()

    def run(tag, **src_kw):
        """fit() once with 1 epoch (pays compile + init + cache build),
        then once with `epochs` on the same Trainer — the jit cache is warm
        and the decode cache is populated, so that whole run is steady
        state: steady per-epoch wall = wN / epochs."""
        src = ImageClassificationSource(df, img_root, image_size=image_size,
                                        train_aug=True, **src_kw)
        trainer = Trainer(cv_arcface_task(model),
                          optax.adam(1e-4), mesh,
                          TrainerConfig(eval_every=10**9, save_every=10**9,
                                        log_every=10**9, margin_init=0.2))
        t0 = time.perf_counter()
        trainer.fit(src, 1, batch, resume=False)
        w1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        trainer.fit(src, epochs, batch, resume=False)
        wN = time.perf_counter() - t0
        steady = wN / epochs
        rate = round(n / steady, 1)
        print(json.dumps({"pipeline": tag,
                          "first_epoch_wall_s": round(w1, 1),
                          "steady_epoch_wall_s": round(steady, 1),
                          "steady_img_per_s": rate}), flush=True)
        return rate

    try:
        # old pipeline: f32 on host, no cache
        old = run("float32-no-cache", emit="float32")
        new = run("uint8+decode_cache", emit="uint8",
                  decode_cache=os.path.join(work, "dc"))
        print(json.dumps({"steady_speedup": round(new / old, 2)}),
              flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    argv = sys.argv[1:]
    # last arg may be a backbone name; everything else must parse as int
    kw = {}
    if argv and not argv[-1].lstrip("-").isdigit():
        kw["backbone"] = argv.pop()
    main(*(int(a) for a in argv), **kw)
