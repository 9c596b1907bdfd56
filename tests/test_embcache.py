"""Packed embedding cache (pipelines/embcache.py): record round-trips,
crash discipline, emb.txt compatibility (daodian_infer.py:259-285 layout),
and ImageEmbedder integration incl. organic migration."""

import os

import jax
import numpy as np
import pytest

from multimodalsimilar_tpu.pipelines.embcache import EmbeddingCache


def _fresh(tmp_path, dim=8, name="c"):
    # bypass the per-directory singleton so each test sees a clean state
    return EmbeddingCache(str(tmp_path / name), dim)


def test_roundtrip_bit_exact(tmp_path):
    c = _fresh(tmp_path)
    rng = np.random.default_rng(0)
    vecs = {f"sku{i}": rng.normal(size=8).astype(np.float32)
            for i in range(50)}
    c.put_many(vecs)
    assert len(c) == 50
    got = c.get_many(list(vecs) + ["missing"])
    assert set(got) == set(vecs)
    for k, v in vecs.items():
        np.testing.assert_array_equal(got[k], v)
    assert c.get("nope") is None
    assert "sku0" in c and "nope" not in c


def test_duplicate_put_keeps_first(tmp_path):
    c = _fresh(tmp_path)
    c.put("k", np.ones(8, np.float32))
    c.put("k", np.zeros(8, np.float32))   # ignored, like DecodedCache
    np.testing.assert_array_equal(c.get("k"), np.ones(8, np.float32))


def test_dim_mismatches_raise(tmp_path):
    c = _fresh(tmp_path)
    with pytest.raises(ValueError, match="vector"):
        c.put("k", np.ones(9, np.float32))
    c.put("k", np.ones(8, np.float32))
    with pytest.raises(ValueError, match="separate"):
        EmbeddingCache(str(tmp_path / "c"), 16)


def test_torn_tail_tolerated_and_realigned(tmp_path):
    c = _fresh(tmp_path)
    c.put("a", np.full(8, 1.0, np.float32))
    c.put("b", np.full(8, 2.0, np.float32))
    # simulate a crash mid-write of the LAST record
    data = tmp_path / "c" / "data.bin"
    with open(data, "r+b") as f:
        f.truncate(os.path.getsize(data) - 4)
    c2 = _fresh(tmp_path)                 # reopen
    np.testing.assert_array_equal(c2.get("a"), np.full(8, 1.0, np.float32))
    assert c2.get("b") is None            # torn record refused, not garbage
    # the next append re-aligns to a record boundary
    c2.put("d", np.full(8, 3.0, np.float32))
    np.testing.assert_array_equal(c2.get("d"), np.full(8, 3.0, np.float32))
    np.testing.assert_array_equal(c2.get("a"), np.full(8, 1.0, np.float32))


def test_cross_instance_index_refresh(tmp_path):
    """A second process (modeled by a second instance over the same
    directory) must see keys appended after it opened."""
    c1 = _fresh(tmp_path)
    c2 = EmbeddingCache(str(tmp_path / "c"), 8)
    c1.put("late", np.full(8, 5.0, np.float32))
    np.testing.assert_array_equal(c2.get("late"),
                                  np.full(8, 5.0, np.float32))


def test_emb_txt_import_export_roundtrip(tmp_path):
    """Reference layout compat: {root}/{sku}/emb.txt written by np.savetxt
    and read by np.loadtxt (daodian_infer.py:259-285)."""
    root = tmp_path / "imgs"
    rng = np.random.default_rng(1)
    vecs = {f"s{i}": rng.normal(size=8).astype(np.float32)
            for i in range(5)}
    for k, v in vecs.items():
        os.makedirs(root / k)
        np.savetxt(root / k / "emb.txt", v)     # the reference's write

    path_for = lambda k: str(root / k / "emb.txt")
    c = _fresh(tmp_path)
    assert c.import_emb_txt(path_for, list(vecs) + ["absent"]) == 5
    for k, v in vecs.items():
        np.testing.assert_allclose(c.get(k), v, rtol=1e-6)

    # export back out in the same layout; np.loadtxt (the reference's
    # read) recovers the vectors
    out = tmp_path / "out"
    out_for = lambda k: str(out / k / "emb.txt")
    assert c.export_emb_txt(out_for) == 5
    for k, v in vecs.items():
        np.testing.assert_allclose(
            np.loadtxt(out_for(k)).astype(np.float32), v, rtol=1e-6)


def test_image_embedder_uses_packed_cache(tmp_path):
    """ImageEmbedder(cache=...): computes once, then serves from the
    packed store (images deleted); legacy emb.txt files migrate in on
    miss without recompute."""
    import cv2

    from multimodalsimilar_tpu.models.efficientnet import EfficientNetConfig
    from multimodalsimilar_tpu.models.vision import CvImageClassifier
    from multimodalsimilar_tpu.pipelines.embedders import ImageEmbedder
    from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

    model = CvImageClassifier(EfficientNetConfig.tiny(), num_labels=3,
                              fc_dim=8,
                              policy=DTypePolicy.full_precision())
    x = jax.numpy.zeros((1, 16, 16, 3))
    variables = model.init({"params": jax.random.key(0)}, x,
                           label=jax.numpy.zeros(1, jax.numpy.int32))
    root = str(tmp_path / "imgs")
    for key, shade in [("100", 200), ("200", 90)]:
        os.makedirs(f"{root}/{key}")
        cv2.imwrite(f"{root}/{key}/0.jpg",
                    np.full((20, 20, 3), shade, np.uint8))

    cache = _fresh(tmp_path)
    emb = ImageEmbedder(
        model, variables, image_size=16, batch_size=4,
        cache_path_for_key=lambda k: f"{root}/{k}/emb.txt", cache=cache)
    paths = lambda k: [f"{root}/{k}/{i}.jpg" for i in range(8)]

    out = emb.embed_keys(["100", "200"], paths)
    assert set(out) == {"100", "200"}
    # packed store written, NO legacy text files
    assert cache.get("100") is not None
    assert not os.path.exists(f"{root}/100/emb.txt")
    # serve from the cache alone (images gone)
    os.remove(f"{root}/100/0.jpg")
    again = emb.embed_keys(["100"], paths)
    np.testing.assert_allclose(again["100"], out["100"], rtol=1e-6)

    # migration: a key present only as legacy emb.txt backfills the cache
    legacy = np.arange(8, dtype=np.float32)
    os.makedirs(f"{root}/300")
    np.savetxt(f"{root}/300/emb.txt", legacy)
    got = emb.embed_keys(["300"], paths)
    np.testing.assert_allclose(got["300"], legacy, rtol=1e-6)
    np.testing.assert_allclose(cache.get("300"), legacy, rtol=1e-6)


def test_append_poisons_foreign_torn_keys_line(tmp_path):
    """A process that crashed mid keys.txt append leaves a torn final line;
    an ALREADY-OPEN instance's next put must poison it under the flock —
    otherwise its first key textually merges into the torn tail
    ('tornkey\\t42') and get() serves another key's embedding."""
    c = _fresh(tmp_path)
    c.put("a", np.full(8, 1.0, np.float32))
    with open(tmp_path / "c" / "keys.txt", "ab") as f:
        f.write(b"torn")                   # crash mid-append, no newline
    c.put("b", np.full(8, 2.0, np.float32))
    np.testing.assert_array_equal(c.get("b"), np.full(8, 2.0, np.float32))
    c2 = EmbeddingCache(str(tmp_path / "c"), 8)   # fresh index from disk
    np.testing.assert_array_equal(c2.get("a"), np.full(8, 1.0, np.float32))
    np.testing.assert_array_equal(c2.get("b"), np.full(8, 2.0, np.float32))
    assert c2.get("tornb") is None
    assert c2.get("torn") is None


def test_image_embedder_recomputes_malformed_legacy_emb_txt(tmp_path):
    """A wrong-dim or unparseable legacy emb.txt (older run with a
    different fc_dim, truncated write) must not kill the job: the key is
    recomputed from its images like a plain cache miss."""
    import cv2

    from multimodalsimilar_tpu.models.efficientnet import EfficientNetConfig
    from multimodalsimilar_tpu.models.vision import CvImageClassifier
    from multimodalsimilar_tpu.pipelines.embedders import ImageEmbedder
    from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

    model = CvImageClassifier(EfficientNetConfig.tiny(), num_labels=3,
                              fc_dim=8,
                              policy=DTypePolicy.full_precision())
    x = jax.numpy.zeros((1, 16, 16, 3))
    variables = model.init({"params": jax.random.key(0)}, x,
                           label=jax.numpy.zeros(1, jax.numpy.int32))
    root = str(tmp_path / "imgs")
    os.makedirs(f"{root}/100")
    cv2.imwrite(f"{root}/100/0.jpg", np.full((20, 20, 3), 200, np.uint8))
    np.savetxt(f"{root}/100/emb.txt",
               np.arange(4, dtype=np.float32))           # wrong dim
    os.makedirs(f"{root}/200")
    cv2.imwrite(f"{root}/200/0.jpg", np.full((20, 20, 3), 90, np.uint8))
    with open(f"{root}/200/emb.txt", "w") as f:
        f.write("0.1 not-a-float 0.3\n")                  # unparseable

    cache = _fresh(tmp_path)
    emb = ImageEmbedder(
        model, variables, image_size=16, batch_size=4,
        cache_path_for_key=lambda k: f"{root}/{k}/emb.txt", cache=cache)
    out = emb.embed_keys(["100", "200"],
                         lambda k: [f"{root}/{k}/{i}.jpg" for i in range(8)])
    assert set(out) == {"100", "200"}          # recomputed, not crashed
    assert out["100"].shape == (8,)
    np.testing.assert_allclose(cache.get("100"), out["100"], rtol=1e-6)


def test_image_embedder_rejects_wrong_dim_emb_txt_without_cache(tmp_path):
    """The wrong-dim legacy guard must not depend on a packed cache being
    configured: with emb_dim given (the CLI passes --fc_dim), a stale
    different-fc_dim emb.txt recomputes instead of flowing a (256,) vector
    into a (512,) np.stack downstream."""
    import cv2

    from multimodalsimilar_tpu.models.efficientnet import EfficientNetConfig
    from multimodalsimilar_tpu.models.vision import CvImageClassifier
    from multimodalsimilar_tpu.pipelines.embedders import ImageEmbedder
    from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

    model = CvImageClassifier(EfficientNetConfig.tiny(), num_labels=3,
                              fc_dim=8,
                              policy=DTypePolicy.full_precision())
    x = jax.numpy.zeros((1, 16, 16, 3))
    variables = model.init({"params": jax.random.key(0)}, x,
                           label=jax.numpy.zeros(1, jax.numpy.int32))
    root = str(tmp_path / "imgs")
    os.makedirs(f"{root}/100")
    cv2.imwrite(f"{root}/100/0.jpg", np.full((20, 20, 3), 200, np.uint8))
    np.savetxt(f"{root}/100/emb.txt",
               np.arange(4, dtype=np.float32))       # stale wrong dim
    emb = ImageEmbedder(model, variables, image_size=16, batch_size=4,
                        cache_path_for_key=lambda k: f"{root}/{k}/emb.txt",
                        emb_dim=8)                   # NO packed cache
    out = emb.embed_keys(
        ["100"], lambda k: [f"{root}/{k}/{i}.jpg" for i in range(8)])
    assert out["100"].shape == (8,)                  # recomputed
