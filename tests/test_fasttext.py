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
