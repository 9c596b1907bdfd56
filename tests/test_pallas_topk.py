"""Pallas streaming top-k kernel: parity with knn_search (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from multimodalsimilar_tpu.ops.topk import pallas_topk
from multimodalsimilar_tpu.retrieval.knn import knn_search


@pytest.mark.parametrize("metric", ["ip", "l2"])
@pytest.mark.parametrize("n,b,k", [(200, 16, 5), (130, 40, 7)])
def test_pallas_topk_matches_knn(metric, n, b, k):
    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(n, 32)).astype(np.float32)
    queries = rng.normal(size=(b, 32)).astype(np.float32)
    want_s, want_i = knn_search(jnp.asarray(corpus), jnp.asarray(queries),
                                k, metric=metric, block_rows=64)
    got_s, got_i = pallas_topk(jnp.asarray(corpus), jnp.asarray(queries),
                               k, metric=metric, block_rows=64, tile_b=8,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=1e-4, atol=1e-4)


def test_pallas_topk_tie_break_lowest_index():
    # duplicate rows -> equal scores; FAISS keeps the lower index first
    corpus = np.tile(np.eye(4, dtype=np.float32), (3, 1))  # rows repeat
    queries = np.eye(4, dtype=np.float32)
    s, i = pallas_topk(jnp.asarray(corpus), jnp.asarray(queries), 3,
                       block_rows=4, tile_b=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(i)[0], [0, 4, 8])
