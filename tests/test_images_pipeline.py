"""Host image-pipeline optimizations: header dimension probe, reduced-scale
JPEG decode, the resized-uint8 DecodedCache, uint8 emission + on-device
normalize. These exist to keep the chip fed (a single host core decodes
~60-80 img/s at 512px vs 150-2400 img/s of device compute)."""

import os

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalsimilar_tpu.data import images as I
from multimodalsimilar_tpu.models.vision import device_normalize


def _write_jpeg(path, h, w, seed=0):
    img = np.random.default_rng(seed).integers(0, 255, (h, w, 3),
                                               dtype=np.uint8)
    cv2.imwrite(str(path), img, [cv2.IMWRITE_JPEG_QUALITY, 92])
    return img


def test_image_dims_jpeg_png(tmp_path):
    _write_jpeg(tmp_path / "a.jpg", 240, 320)
    assert I.image_dims(str(tmp_path / "a.jpg")) == (240, 320)
    cv2.imwrite(str(tmp_path / "a.png"),
                np.zeros((120, 80, 3), np.uint8))
    assert I.image_dims(str(tmp_path / "a.png")) == (120, 80)
    (tmp_path / "junk.jpg").write_bytes(b"\xff\xd8\xff\x00garbage")
    assert I.image_dims(str(tmp_path / "junk.jpg")) is None
    assert I.image_dims(str(tmp_path / "missing.jpg")) is None


def test_image_dims_jpeg_fill_bytes(tmp_path):
    """JPEGs may pad with extra 0xFF fill bytes before a marker code — the
    probe must skip them, not misparse a length from the padding."""
    p = tmp_path / "fill.jpg"
    raw = (tmp_path / "plain.jpg")
    _write_jpeg(raw, 48, 64)
    data = raw.read_bytes()
    # inject fill bytes after SOI, before the first marker
    padded = data[:2] + b"\xff\xff\xff" + data[2:]
    p.write_bytes(padded)
    assert I.image_dims(str(p)) == (48, 64)


def test_decoded_cache_crash_tolerance(tmp_path):
    d = str(tmp_path / "cache")
    img = np.random.default_rng(5).integers(0, 255, (8, 8, 3),
                                            dtype=np.uint8)
    c = I.DecodedCache(d, 8)
    c.put("a", img)
    # crash mid-append: torn data.bin tail + torn keys.txt line
    with open(c._data_path, "ab") as f:
        f.write(b"\x00" * 17)                 # partial record
    with open(c._keys_path, "a") as f:
        f.write("b\t1")                       # no trailing newline
    c2 = I.DecodedCache(d, 8)
    assert c2.get("a") is not None and c2.get("b") is None
    img2 = img[::-1].copy()
    c2.put("b", img2)                         # realigns over the torn tail
    np.testing.assert_array_equal(c2.get("b"), img2)
    np.testing.assert_array_equal(c2.get("a"), img)
    c3 = I.DecodedCache(d, 8)
    np.testing.assert_array_equal(c3.get("b"), img2)


def test_decoded_cache_open_is_shared(tmp_path):
    d = str(tmp_path / "cache")
    a = I.DecodedCache.open(d, 8)
    b = I.DecodedCache.open(d, 8)
    assert a is b                             # one lock per directory
    assert I.DecodedCache.open(d + "2", 8) is not a


def test_decode_reduced_scale(tmp_path):
    p = str(tmp_path / "big.jpg")
    _write_jpeg(p, 600, 600)
    full = I.decode_image(p)
    assert full.shape == (600, 600, 3)
    # 600/4=150 >= 128 -> the 1/4-scale DCT decode
    red = I.decode_image(p, min_size=128)
    assert red is not None and min(red.shape[:2]) >= 128
    assert min(red.shape[:2]) < 600
    # target bigger than any reduction -> full decode
    assert I.decode_image(p, min_size=512).shape == (600, 600, 3)
    # smaller than every reduction of a tiny image -> full decode
    q = str(tmp_path / "small.jpg")
    _write_jpeg(q, 40, 40)
    assert I.decode_image(q, min_size=64).shape == (40, 40, 3)


def test_decoded_cache_roundtrip_and_persistence(tmp_path):
    d = str(tmp_path / "cache")
    c = I.DecodedCache(d, 16)
    img = np.random.default_rng(0).integers(0, 255, (16, 16, 3),
                                            dtype=np.uint8)
    assert c.get("k1") is None
    c.put("k1", img)
    np.testing.assert_array_equal(c.get("k1"), img)
    # a second instance on the same directory sees the record
    c2 = I.DecodedCache(d, 16)
    np.testing.assert_array_equal(c2.get("k1"), img)
    # interleaved appends from two instances stay slot-consistent
    img2 = img[::-1].copy()
    c2.put("k2", img2)
    c.put("k3", img)
    c3 = I.DecodedCache(d, 16)
    np.testing.assert_array_equal(c3.get("k2"), img2)
    np.testing.assert_array_equal(c3.get("k3"), img)
    assert len(c3) == 3
    # size mismatch is refused instead of corrupting
    with pytest.raises(ValueError):
        I.DecodedCache(d, 32)


def test_load_eval_uint8_matches_host_normalize(tmp_path):
    p = str(tmp_path / "x.jpg")
    _write_jpeg(p, 64, 48, seed=3)
    f32 = I.load_eval(p, 32)
    u8 = I.load_eval(p, 32, normalize_host=False)
    assert u8.dtype == np.uint8
    np.testing.assert_array_equal(I.normalize(u8), f32)
    # train path: identical rng draws -> identical augmentation
    a = I.load_train(p, 32, np.random.default_rng(7))
    b = I.load_train(p, 32, np.random.default_rng(7), normalize_host=False)
    np.testing.assert_array_equal(I.normalize(b), a)


def test_device_normalize_bit_exact():
    u8 = np.random.default_rng(1).integers(0, 255, (2, 8, 8, 3),
                                           dtype=np.uint8)
    got = np.asarray(device_normalize(jnp.asarray(u8)))
    np.testing.assert_array_equal(got, I.normalize(u8))
    f = I.normalize(u8)
    out = device_normalize(jnp.asarray(f))
    np.testing.assert_array_equal(np.asarray(out), f)


def test_source_uint8_emission_and_cache_hits(tmp_path, monkeypatch):
    import pandas as pd

    from multimodalsimilar_tpu.data.datasets import ImageClassificationSource

    root = tmp_path / "imgs"
    root.mkdir()
    for i in range(6):
        _write_jpeg(root / f"{i}.jpg", 40, 40, seed=i)
    df = pd.DataFrame({"goods_sku": [str(i) for i in range(6)],
                       "tag_new_id": [i % 2 for i in range(6)]})

    calls = {"n": 0}
    real = I.decode_image

    def counting(path, min_size=None):
        calls["n"] += 1
        return real(path, min_size)

    monkeypatch.setattr(I, "decode_image", counting)
    src = ImageClassificationSource(
        df, str(root), image_size=16, train_aug=True,
        decode_cache=str(tmp_path / "dc"), emit="uint8")
    b1 = list(src.batches(3, seed=1, epoch=0))
    assert calls["n"] == 6
    assert all(b["images"].dtype == np.uint8 for b in b1)
    assert b1[0]["images"].shape == (3, 16, 16, 3)
    # epoch 2: every decode served from the cache
    list(src.batches(3, seed=1, epoch=1))
    assert calls["n"] == 6
    # augmentation still varies per epoch (cache holds pre-aug pixels)
    b2 = list(src.batches(3, seed=1, epoch=1))
    assert not all(np.array_equal(x["images"], y["images"])
                   for x, y in zip(b1, b2))
    with pytest.raises(ValueError):
        ImageClassificationSource(df, str(root), emit="float16")


def test_cv_task_uint8_equals_float32_loss(tmp_path):
    """The jitted step normalizes uint8 inputs to the exact pixels the f32
    pipeline would ship — same loss either way."""
    import jax

    from multimodalsimilar_tpu.models.vision import (
        CvImageClassifier, backbone_config)
    from multimodalsimilar_tpu.train.tasks import cv_arcface_task
    from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

    model = CvImageClassifier(backbone_config("tiny"), num_labels=3,
                              fc_dim=8, policy=DTypePolicy.full_precision())
    task = cv_arcface_task(model)
    u8 = np.random.default_rng(0).integers(0, 255, (2, 32, 32, 3),
                                           dtype=np.uint8)
    labels = np.asarray([0, 2], np.int32)
    variables = task.init(jax.random.key(0),
                          {"images": u8, "labels": labels})
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def loss_of(imgs):
        out, _ = task.train_loss(params, stats,
                                 {"images": imgs, "labels": labels},
                                 jax.random.key(1), 0.2)
        return float(out)

    assert loss_of(u8) == pytest.approx(loss_of(I.normalize(u8)), rel=1e-6)
