import jax
import jax.numpy as jnp
import numpy as np

from coxgraph_tpu.ops import pallas_kernels as pk


def random_desc(key, k):
    return jax.random.bits(key, (k, 8), jnp.uint32)


def test_hamming_match_interpret_matches_reference():
    da = random_desc(jax.random.PRNGKey(0), 128)
    db = random_desc(jax.random.PRNGKey(1), 96)
    d1, i1, d2 = pk.hamming_match_topk(da, db, interpret=True)
    rd1, ri1, rd2 = pk.hamming_match_topk_reference(da, db)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(rd1))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(ri1))
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(rd2))


def test_hamming_match_multi_tile():
    da = random_desc(jax.random.PRNGKey(2), 384)
    db = random_desc(jax.random.PRNGKey(3), 200)
    d1, i1, d2 = pk.hamming_match_topk(da, db, interpret=True)
    rd1, ri1, rd2 = pk.hamming_match_topk_reference(da, db)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(rd1))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(ri1))


def test_self_match_is_zero():
    da = random_desc(jax.random.PRNGKey(4), 128)
    d1, i1, d2 = pk.hamming_match_topk(da, da, interpret=True)
    np.testing.assert_array_equal(np.asarray(d1), np.zeros(128))
    np.testing.assert_array_equal(np.asarray(i1), np.arange(128))
