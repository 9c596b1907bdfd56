"""CV convergence demonstration through the real CLI (round-5 VERDICT #4).

Text has both the offline golden (tests/test_convergence_golden.py) and
the at-scale curve (convergence_scale.py); the image recipe
(cv_classifier_train_daodian.py:272-306 — margin curriculum, micro-F1
validation) had throughput rows only. This runs `cli train cv` on a
synthetic image problem that is learnable but not trivial:

class k -> (hue, stripe period, stripe orientation); per image the
stripe PHASE, brightness and pixel noise are random, so mean color alone
cannot separate same-hue classes — the net must read spatial structure.

Run on the TPU (reference-shaped, ~10 min):
  python benchmarks/cv_convergence.py --classes 50 --per_class 20 \
      --backbone efficientnet_b4 --image_size 512 --batch_size 24 \
      --epochs 8 --margin 0.1 --margin_delta_per_epoch 0.04
CPU smoke:
  JAX_PLATFORMS=cpu python benchmarks/cv_convergence.py --classes 6 \
      --per_class 8 --backbone tiny --image_size 32 --src_px 48 \
      --batch_size 8 --epochs 4 --fc_dim 16
Prints ONE JSON line with the micro-F1/acc-vs-steps trajectory.
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

HUES = [(220, 40, 40), (40, 220, 40), (40, 40, 220), (220, 220, 40),
        (220, 40, 220), (40, 220, 220), (220, 130, 40), (130, 40, 220),
        (40, 130, 130), (160, 160, 160)]


def class_image(cls, rng, px):
    """Striped color tile: hue = cls % 10, stripe period/orientation =
    cls // 10; random phase/brightness/noise per image."""
    hue = np.array(HUES[cls % len(HUES)], np.float32)
    variant = cls // len(HUES)
    period = 6 + 4 * (variant % 4)            # stripe width in px
    horizontal = (variant // 4) % 2 == 0
    phase = rng.integers(0, period)
    coord = np.arange(px) + phase
    stripe = ((coord // (period // 2)) % 2).astype(np.float32)
    field = stripe[None, :] * np.ones((px, 1), np.float32) if horizontal \
        else stripe[:, None] * np.ones((1, px), np.float32)
    brightness = rng.uniform(0.7, 1.1)
    img = (hue[None, None] * (0.45 + 0.55 * field[..., None])
           * brightness)
    img = img + rng.normal(0, 14, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--classes", type=int, default=50)
    ap.add_argument("--per_class", type=int, default=20)
    ap.add_argument("--eval_per_class", type=int, default=4)
    ap.add_argument("--src_px", type=int, default=96)
    ap.add_argument("--backbone", default="efficientnet_b4")
    ap.add_argument("--image_size", type=int, default=512)
    ap.add_argument("--fc_dim", type=int, default=512)
    ap.add_argument("--batch_size", type=int, default=24)   # CFG.batch :52
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--eval_every", type=int, default=50)
    ap.add_argument("--margin", type=float, default=0.1)
    ap.add_argument("--margin_delta_per_epoch", type=float, default=0.04)
    args, extra = ap.parse_known_args()   # unknown flags pass through
    args.extra = extra                    # to `cli train cv` verbatim

    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import cv2
    import pandas as pd

    rng = np.random.default_rng(0)
    out = tempfile.mkdtemp(prefix="cv_convergence_")
    img_root = os.path.join(out, "imgs")
    os.makedirs(img_root)

    def write_split(name, per_class, start_idx):
        rows = []
        i = start_idx
        for c in range(args.classes):
            for _ in range(per_class):
                sku = str(i)
                cv2.imwrite(os.path.join(img_root, f"{sku}.jpg"),
                            class_image(c, rng, args.src_px)[..., ::-1])
                rows.append({"goods_sku": sku, "tag_new_id": c})
                i += 1
        rng.shuffle(rows)
        pd.DataFrame(rows).to_csv(os.path.join(out, f"{name}.csv"),
                                  index=False)
        return i

    n = write_split("train", args.per_class, 0)
    write_split("eval", args.eval_per_class, n)

    from multimodalsimilar_tpu.cli import main as cli_main
    cli_main(["train", "cv",
              "--data", os.path.join(out, "train.csv"),
              "--eval_data", os.path.join(out, "eval.csv"),
              "--img_root", img_root,
              "--output", os.path.join(out, "run"),
              "--backbone", args.backbone,
              "--image_size", str(args.image_size),
              "--fc_dim", str(args.fc_dim),
              "--batch_size", str(args.batch_size),
              "--epochs", str(args.epochs),
              "--eval_every", str(args.eval_every),
              "--save_every", "10000000",
              "--log_every", "25",
              "--margin", str(args.margin),
              "--margin_delta_per_epoch",
              str(args.margin_delta_per_epoch)] + list(args.extra))

    traj, thru = [], []
    with open(os.path.join(out, "run", "metrics.jsonl"),
              encoding="utf-8") as f:
        for line in f:
            rec = json.loads(line)
            if "eval/micro_f1" in rec or "eval/acc" in rec:
                traj.append([rec["step"],
                             round(rec.get("eval/micro_f1",
                                           rec.get("eval/acc")), 4)])
            if "train/examples_per_sec" in rec:
                thru.append(rec["train/examples_per_sec"])
    print(json.dumps({
        "classes": args.classes,
        "train_images": args.classes * args.per_class,
        "backbone": args.backbone, "image_size": args.image_size,
        "batch": args.batch_size,
        "margin": args.margin,
        "margin_delta_per_epoch": args.margin_delta_per_epoch,
        "micro_f1_vs_steps": traj,
        "final_micro_f1": traj[-1][1] if traj else None,
        "steady_examples_per_sec": round(float(np.median(thru)), 1)
        if thru else None,
        "metrics": os.path.join(out, "run", "metrics.jsonl"),
    }))


if __name__ == "__main__":
    main()
