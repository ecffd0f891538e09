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


# ---------------------------------------------------------------------------
# CBSR compaction kernel (cbsr_compact_pallas) vs the XLA oracle
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dim,k", [(256, 32), (200, 8), (384, 64)])
def test_cbsr_compact_full_rows_exact(rng, dim, k):
    """Rows with exactly k nonzeros: channels AND values bit-match the
    oracle (ops.maxk.cbsr_from_masked)."""
    from spgemm_gnn_tpu.kernels.maxk_pallas import cbsr_compact_pallas
    from spgemm_gnn_tpu.ops.maxk import cbsr_from_masked
    x = jnp.asarray(rng.standard_normal((120, dim)).astype(np.float32))
    xm = maxk(x, k)
    v0, c0 = cbsr_from_masked(xm, k)
    v1, c1 = cbsr_compact_pallas(xm, k)
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))


def test_cbsr_compact_deficient_rows(rng):
    """Rows with < k nonzeros: dense reconstruction is exact and the k
    channels stay distinct (the property the scatter VJP needs)."""
    from spgemm_gnn_tpu.kernels.maxk_pallas import cbsr_compact_pallas
    from spgemm_gnn_tpu.ops.maxk import cbsr_to_dense
    dim, k = 256, 16
    xm = maxk(jnp.asarray(rng.standard_normal((80, dim)).astype(np.float32)), k)
    xm = jnp.where(jnp.asarray(rng.random((80, dim)) < 0.5), xm, 0.0)
    v, c = cbsr_compact_pallas(xm, k)
    np.testing.assert_array_equal(
        np.asarray(cbsr_to_dense(v, c, dim)), np.asarray(xm))
    c = np.asarray(c)
    assert all(len(set(row)) == k for row in c)
    # all-zero row pads with the k lowest channels
    v0, c0 = cbsr_compact_pallas(jnp.zeros((8, dim), jnp.float32), k)
    np.testing.assert_array_equal(np.asarray(v0), 0.0)
    np.testing.assert_array_equal(np.asarray(c0),
                                  np.broadcast_to(np.arange(k), (8, k)))


def test_cbsr_compact_grad_matches_oracle(rng):
    from spgemm_gnn_tpu.kernels.maxk_pallas import cbsr_compact_pallas
    from spgemm_gnn_tpu.ops.maxk import cbsr_from_masked
    dim, k = 256, 8
    xm = maxk(jnp.asarray(rng.standard_normal((60, dim)).astype(np.float32)), k)
    w = jnp.asarray(rng.standard_normal((60, k)).astype(np.float32))
    g0 = jax.grad(lambda x: jnp.sum(cbsr_from_masked(x, k)[0] * w))(xm)
    g1 = jax.grad(lambda x: jnp.sum(cbsr_compact_pallas(x, k)[0] * w))(xm)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-6)


def test_cbsr_compact_grad_deficient_rows_via_densify(rng):
    """On DEFICIENT rows the pad-slot order differs from the oracle, so raw
    per-slot gradients may diverge under an order-sensitive cotangent; the
    kernel's contract (docstring) is grad equivalence through order-invariant
    consumers. Assert it through cbsr_to_dense — the scatter every in-repo
    consumer is built on (ADVICE r2)."""
    from spgemm_gnn_tpu.kernels.maxk_pallas import cbsr_compact_pallas
    from spgemm_gnn_tpu.ops.maxk import cbsr_from_masked, cbsr_to_dense
    dim, k = 256, 16
    xm = maxk(jnp.asarray(rng.standard_normal((80, dim)).astype(np.float32)), k)
    xm = jnp.where(jnp.asarray(rng.random((80, dim)) < 0.5), xm, 0.0)  # deficient
    w = jnp.asarray(rng.standard_normal((80, dim)).astype(np.float32))

    def loss(x, compact):
        v, c = compact(x, k)
        return jnp.sum(cbsr_to_dense(v, c, dim) * w)

    g0 = jax.grad(lambda x: loss(x, cbsr_from_masked))(xm)
    g1 = jax.grad(lambda x: loss(x, cbsr_compact_pallas))(xm)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-6)


def test_cbsr_compact_dispatch_cpu(rng):
    """ops.maxk.cbsr_compact falls back to the oracle off-TPU."""
    from spgemm_gnn_tpu.ops.maxk import cbsr_compact, cbsr_from_masked
    xm = maxk(jnp.asarray(rng.standard_normal((16, 128)).astype(np.float32)), 4)
    v0, c0 = cbsr_from_masked(xm, 4)
    v1, c1 = cbsr_compact(xm, 4)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))


def test_cbsr_compact_under_shard_map(rng):
    """The compaction kernel (interpret) inside shard_map on the virtual mesh
    — the configuration the multi-chip CBSR exchange uses on real chips."""
    from functools import partial
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from spgemm_gnn_tpu.kernels.maxk_pallas import cbsr_compact_pallas
    from spgemm_gnn_tpu.ops.maxk import cbsr_from_masked
    from spgemm_gnn_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(4)
    dim, k = 128, 8
    xm = maxk(jnp.asarray(rng.standard_normal((64, dim)).astype(np.float32)), k)
    fn = shard_map(partial(cbsr_compact_pallas, k=k, interpret=True),
                   mesh=mesh, in_specs=P(mesh.axis_names[0]),
                   out_specs=P(mesh.axis_names[0]), check_vma=False)
    v1, c1 = fn(xm)
    v0, c0 = cbsr_from_masked(xm, k)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
