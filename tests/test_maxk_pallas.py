"""Pallas MaxK kernel vs the XLA reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spgemm_gnn_tpu.kernels.maxk_pallas import maxk_pallas
from spgemm_gnn_tpu.ops.maxk import maxk


@pytest.mark.parametrize("k", [1, 4, 16])
@pytest.mark.parametrize("shape", [(64, 128), (100, 256)])
def test_maxk_pallas_matches_xla(rng, k, shape):
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    y = np.asarray(maxk_pallas(x, k, 32))
    y_ref = np.asarray(maxk(x, k))
    np.testing.assert_allclose(y, y_ref, rtol=1e-6)


def test_maxk_pallas_negative_rows(rng):
    """Rows that are entirely negative keep their top-k (negative) values."""
    x = jnp.asarray(-np.abs(rng.standard_normal((32, 128))).astype(np.float32))
    y = np.asarray(maxk_pallas(x, 8, 32))
    y_ref = np.asarray(maxk(x, 8))
    np.testing.assert_allclose(y, y_ref, rtol=1e-6)
    assert (np.asarray(y) != 0).sum() == 32 * 8


def test_maxk_pallas_ties(rng):
    """Duplicate values at the pivot: lowest channel indices win (torch.topk
    order, reference utils/models.py:14)."""
    x = np.zeros((16, 128), np.float32)
    x[:, ::2] = 1.0   # 64 equal candidates per row
    y = np.asarray(maxk_pallas(jnp.asarray(x), 8, 16))
    for r in range(16):
        nz = np.flatnonzero(y[r])
        np.testing.assert_array_equal(nz, np.arange(0, 16, 2))


def test_maxk_pallas_grad(rng):
    x = jnp.asarray(rng.standard_normal((40, 128)).astype(np.float32))
    k = 8
    g1 = np.asarray(jax.grad(lambda x: (maxk_pallas(x, k, 40) ** 2).sum())(x))
    g2 = np.asarray(jax.grad(lambda x: (maxk(x, k) ** 2).sum())(x))
    np.testing.assert_allclose(g1, g2, rtol=1e-5)


def test_maxk_pallas_k_ge_dim(rng):
    x = jnp.asarray(rng.standard_normal((8, 128)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(maxk_pallas(x, 128, 8)),
                                  np.asarray(x))


def test_maxk_op_dispatch(rng):
    """kernels.api.maxk_op: XLA oracle on CPU, pass-through for k >= dim."""
    from spgemm_gnn_tpu.kernels.api import maxk_op
    x = jnp.asarray(rng.standard_normal((24, 128)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(maxk_op(x, 8)),
                                  np.asarray(maxk(x, 8)))
    np.testing.assert_array_equal(np.asarray(maxk_op(x, None)), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(maxk_op(x, 128)), np.asarray(x))
    # forced oracle matches too
    np.testing.assert_array_equal(np.asarray(maxk_op(x, 8, impl="xla")),
                                  np.asarray(maxk(x, 8)))
