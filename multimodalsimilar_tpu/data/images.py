"""Image decode / resize / normalize / augment on the host.

Replaces the reference's albumentations recipes (getAugmentation,
daodian_infer.py:107-129 and cv_classifier_train_daodian.py:66-88):

  train: Resize -> HFlip(0.5) -> VFlip(0.5) -> Rotate(±120°, 0.75) ->
         RandomBrightness(0.09..0.6, 0.5) -> Normalize(imagenet)
  eval:  Resize -> Normalize(imagenet)

Output is float32 NHWC (TPU conv layout) — no ToTensorV2/NCHW transpose.
Decoding reads BGR via cv2 and converts to RGB exactly like cv_dataset.py:34-35.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def decode_image(path: str) -> Optional[np.ndarray]:
    """Read an image file to RGB uint8 HWC; None on any failure (the
    reference's per-row try/except skip semantics, cv_dataset.py:33-41)."""
    try:
        import cv2
        img = cv2.imread(path)
        if img is None:
            return None
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    except Exception:
        return None


def resize(img: np.ndarray, size: int) -> np.ndarray:
    import cv2
    return cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)


def normalize(img: np.ndarray) -> np.ndarray:
    """uint8 HWC -> float32 HWC, imagenet mean/std (albumentations
    Normalize semantics: x/255 then (x-mean)/std)."""
    x = img.astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def augment_train(img: np.ndarray, rng: np.random.Generator,
                  size: int) -> np.ndarray:
    """Train-time augmentation, mirroring the reference's recipe."""
    import cv2
    img = resize(img, size)
    if rng.uniform() < 0.5:
        img = img[:, ::-1]
    if rng.uniform() < 0.5:
        img = img[::-1, :]
    if rng.uniform() < 0.75:
        angle = rng.uniform(-120, 120)
        mat = cv2.getRotationMatrix2D((size / 2, size / 2), angle, 1.0)
        img = cv2.warpAffine(img, mat, (size, size),
                             borderMode=cv2.BORDER_REFLECT_101)
    if rng.uniform() < 0.5:
        # albumentations RandomBrightness(limit=(0.09, 0.6)): scale by 1+beta
        beta = rng.uniform(0.09, 0.6)
        img = np.clip(img.astype(np.float32) * (1.0 + beta), 0, 255
                      ).astype(np.uint8)
    return normalize(np.ascontiguousarray(img))


def load_eval(path: str, size: int) -> Optional[np.ndarray]:
    img = decode_image(path)
    if img is None:
        return None
    return normalize(resize(img, size))


def load_train(path: str, size: int,
               rng: np.random.Generator) -> Optional[np.ndarray]:
    img = decode_image(path)
    if img is None:
        return None
    return augment_train(img, rng, size)
