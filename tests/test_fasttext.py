"""fastText-equivalent: vocab/hashing, training convergence, sentence vecs."""

import numpy as np

from multimodalsimilar_tpu.models.fasttext import (
    EOS, FastTextVocab, _fnv1a, sentence_vector, train_supervised)


def test_fnv1a_known_values():
    # FNV-1a 32-bit reference values
    assert _fnv1a("") == 2166136261
    assert _fnv1a("a") == 0xE40C292C
    assert _fnv1a("foobar") == 0xBF9CF968


def test_vocab_and_bigrams():
    v = FastTextVocab.build(["红 苹果", "青 苹果"], bucket=1000)
    assert EOS in v.words
    ids = v.line_ids("红 苹果")
    # words: 红, 苹果, EOS + 2 bigrams (红_苹果, 苹果_EOS)
    assert len(ids) == 5
    assert sum(i >= v.nwords for i in ids) == 2  # bigram bucket ids
    # deterministic
    assert ids == v.line_ids("红 苹果")


def test_train_supervised_learns_toy_problem():
    rng = np.random.default_rng(0)
    fruit = ["苹果", "香蕉", "梨子", "葡萄"]
    drink = ["可乐", "雪碧", "果汁", "牛奶"]
    texts, labels = [], []
    for _ in range(200):
        f = rng.choice(fruit, 2)
        texts.append(" ".join(f) + " 新鲜")
        labels.append("__label__fruit")
        d = rng.choice(drink, 2)
        texts.append(" ".join(d) + " 冰镇")
        labels.append("__label__drink")
    model = train_supervised(texts, labels, dim=16, epochs=20,
                             bucket=2000, batch_size=64)
    n, p, r = model.test(texts[:100], labels[:100])
    assert n == 100 and p > 0.95
    # embedding geometry: class centroids separate in sentence-vector space
    fr_vecs = model.get_sentence_vector(
        [t for t, l in zip(texts, labels) if l.endswith("fruit")][:50])
    dr_vecs = model.get_sentence_vector(
        [t for t, l in zip(texts, labels) if l.endswith("drink")][:50])
    fc, dc = fr_vecs.mean(0), dr_vecs.mean(0)

    def cos(a, b):
        return a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    # held-out probes (not in the centroid sets) land with their class
    fruit_texts = [t for t, l in zip(texts, labels) if l.endswith("fruit")]
    probe = model.get_sentence_vector([fruit_texts[60]])[0]
    assert cos(probe, fc) > cos(probe, dc)


def test_sentence_vector_unit_token_mean():
    import jax.numpy as jnp
    params = {"input": jnp.asarray([[3.0, 0.0], [0.0, 4.0], [0.0, 0.0]]),
              "output": jnp.zeros((2, 2))}
    ids = jnp.asarray([[0, 1, 2]])
    mask = jnp.asarray([[1.0, 1.0, 1.0]])
    out = np.asarray(sentence_vector(params, ids, mask))[0]
    # tokens normalized to unit then averaged over 3 (zero vec contributes 0)
    np.testing.assert_allclose(out, [1 / 3, 1 / 3], rtol=1e-6)


def test_fnv1a_sign_extension_matches_fasttext():
    """fastText XORs sign-extended bytes (dictionary.cc uint32_t(int8_t(c)))
    — non-ASCII hashes diverge under plain zero-extension. '红色' pins the
    real fastText value; ASCII goldens above are extension-invariant."""
    assert _fnv1a("红色") == 1319368805


def test_native_encoder_matches_python_incl_unicode_space():
    """The native packer must produce byte-identical ids to the Python
    path, including full-width U+3000 spaces (review finding: the C
    splitter only knew ASCII whitespace; lines are now normalized)."""
    lines = ["红色　连衣裙", "苹果 牛奶", "foobar baz 红色"]
    v = FastTextVocab.build(lines)
    ids_n, mask_n = v.encode_batch(lines, 16)
    v2 = FastTextVocab(dict(v.words), v.bucket, v.min_count)
    object.__setattr__(v2, "_native_failed", True)   # force Python path
    ids_p, mask_p = v2.encode_batch(lines, 16)
    if getattr(v, "_native", None) is None:
        import pytest
        pytest.skip("native packer unavailable on this host")
    np.testing.assert_array_equal(ids_n, ids_p)
    np.testing.assert_array_equal(mask_n, mask_p)


def test_sparse_update_matches_dense_sgd_oracle():
    """Round 4: train_supervised's sparse scatter-add embedding update is
    BIT-level math with the dense-gradient SGD it replaced (the SGD
    update is linear in the gradient, and .at[].add accumulates
    duplicate ids exactly like the dense scatter). Oracle: the old dense
    step, restated inline, driven over the same batch order."""
    import jax
    import numpy as np
    import optax

    from multimodalsimilar_tpu.models.fasttext import (
        FastTextVocab, init_params, logits_fn, train_supervised)

    texts = ["苹果 水果 甜", "香蕉 水果", "牛奶 乳品 鲜", "酸奶 乳品",
             "苹果 甜", "牛奶 鲜"] * 6
    labels = [0, 0, 1, 1, 0, 1] * 6
    dim, epochs, lr, bs, mt = 6, 3, 0.1, 8, 8

    model = train_supervised(texts, labels, dim=dim, lr=lr, epochs=epochs,
                             word_ngrams=2, bucket=64, batch_size=bs,
                             max_tokens=mt, seed=3)

    # dense oracle with the exact same data pipeline and batch order
    vocab = FastTextVocab.build(texts, 64, 1)
    label_list = sorted(set(labels))
    y = np.asarray([label_list.index(l) for l in labels], np.int32)
    ids, mask = vocab.encode_batch(texts, mt, 2)
    params = init_params(jax.random.key(3), vocab.size, dim,
                         len(label_list))
    n = len(texts)
    spe = max(n // bs, 1)
    sched = optax.linear_schedule(lr, 0.0, epochs * spe)
    tx = optax.sgd(sched)
    opt_state = tx.init(params)

    @jax.jit
    def dense_step(params, opt_state, bi, bm, by):
        def loss_fn(p):
            lg = logits_fn(p, bi, bm)
            return optax.softmax_cross_entropy_with_integer_labels(
                lg, by).mean()
        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state

    rng = np.random.default_rng(3)
    for _ in range(epochs):
        order = rng.permutation(n)
        for s in range(spe):
            sel = order[s * bs:(s + 1) * bs]
            params, opt_state = dense_step(
                params, opt_state, ids[sel], mask[sel], y[sel])

    np.testing.assert_allclose(np.asarray(model.params["input"]),
                               np.asarray(params["input"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(model.params["output"]),
                               np.asarray(params["output"]),
                               rtol=1e-5, atol=1e-6)


def test_inference_batch_bucketing_is_exact_and_shape_stable():
    """Round 4: get_sentence_vector/predict pad the batch to pow2
    buckets (jitted forward compiles once per bucket, not once per
    exact corpus size — daodian areas all differ and grow +1 per
    online upsert). Pad rows are sliced off: results bit-equal across
    batch sizes, and encode shapes are identical within a bucket."""
    from multimodalsimilar_tpu.models.fasttext import _pad_to_bucket

    rng = np.random.default_rng(1)
    words = [f"词{i}" for i in range(30)]
    texts = [" ".join(rng.choice(words, 3)) for _ in range(70)]
    model = train_supervised(texts, [i % 3 for i in range(70)],
                             dim=8, epochs=2, bucket=500)
    full = model.get_sentence_vector(texts)
    assert full.shape == (70, 8)
    # slices of every size reproduce the full run's rows bit-exactly
    for n in (1, 31, 32, 33, 64, 70):
        out = model.get_sentence_vector(texts[:n])
        assert out.shape == (n, 8)
        np.testing.assert_array_equal(out, full[:n])
        assert model.predict(texts[:n]).tolist() == \
            model.predict(texts)[:n].tolist()
    # shape stability: one padded shape per bucket
    shapes = set()
    for n in (33, 40, 64):
        ids, mask = model._encode(texts[:n])
        shapes.add(ids.shape)
    assert shapes == {(64, model.max_tokens)}
    # empty batch
    assert model.get_sentence_vector([]).shape == (0, 8)
    assert model.predict([]).shape == (0,)
    # helper edge: n=1 pads to the floor bucket
    ids, mask = _pad_to_bucket(np.ones((1, 4), np.int32),
                               np.ones((1, 4), np.float32))
    assert ids.shape == (32, 4) and mask[1:].sum() == 0


def test_pickle_roundtrip_restores_device_params():
    """A pickled model's params must come back device-resident (host
    numpy tables re-upload ~80 MB per call through the relay)."""
    import pickle

    import jax

    model = train_supervised(["苹果 香蕉", "可乐 雪碧"], ["a", "b"],
                             dim=4, epochs=1, bucket=100)
    clone = pickle.loads(pickle.dumps(model))
    assert isinstance(clone.params["input"], jax.Array)
    np.testing.assert_array_equal(
        clone.get_sentence_vector(["苹果 香蕉"]),
        model.get_sentence_vector(["苹果 香蕉"]))


def test_chain_steps_matches_python_loop():
    """chain_steps=K (one lax.scan program per K SGD steps, built for
    the relay's per-program dispatch floor) is the SAME math in the same
    order as the step-per-program loop: final parameters match to f32
    fusion noise and predictions are identical. Remainder steps (n not
    divisible by K*batch) exercise the single-step fallback."""
    rng = np.random.default_rng(3)
    toks = ["苹果", "香蕉", "可乐", "雪碧", "纸巾", "大米"]
    texts = [" ".join(rng.choice(toks, 3)) for _ in range(330)]
    labels = [int(t[0] in "苹香") for t in texts]
    kw = dict(dim=12, epochs=3, bucket=1000, batch_size=32, seed=7)
    base = train_supervised(texts, labels, **kw)
    for K in (4, 7):            # 330//32 = 10 steps/epoch: remainders hit
        chained = train_supervised(texts, labels, chain_steps=K, **kw)
        for k in ("input", "output"):
            np.testing.assert_allclose(
                np.asarray(chained.params[k]), np.asarray(base.params[k]),
                rtol=2e-5, atol=2e-6)
        assert chained.predict_labels(texts[:50]) == \
            base.predict_labels(texts[:50])
