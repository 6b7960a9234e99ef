"""Context-parallel attention hooks: sequence-sharded results must match the
single-device math exactly (8 virtual CPU devices, mesh ('data','model'))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurec.config import MeshConfig
from tpurec.core.mesh import make_mesh
from tpurec.ops.attention_cp import din_attention_cp, softmax_attention_cp
from tpurec.ops.pallas.kernels import din_attention_reference


@pytest.fixture(scope="module")
def mesh_ctx():
    # all 8 devices on 'model' — the CP axis
    return make_mesh(MeshConfig(data=1, model=8))


def _data(b=8, l=32, d=8, h=6, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, l, d)).astype(np.float32))
    lengths = rng.integers(1, l + 1, size=(b,))
    mask = jnp.asarray((np.arange(l)[None, :] < lengths[:, None]).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(4 * d, h)).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.normal(size=(h,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(h,)).astype(np.float32) * 0.2)
    al = jnp.full((h,), 0.25, jnp.float32)
    return q, k, mask, w1, b1, w2, al


def test_din_cp_matches_single_device(mesh_ctx):
    q, k, mask, w1, b1, w2, al = _data()
    pooled_cp, scores_cp = din_attention_cp(
        q, k, mask, w1, b1, w2, al, mesh_ctx.mesh
    )
    pooled, scores = din_attention_reference(q, k, mask, w1, b1, w2, al)
    np.testing.assert_allclose(np.asarray(pooled_cp), np.asarray(pooled), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(scores_cp), np.asarray(scores), rtol=1e-5, atol=1e-6)


def test_din_cp_under_jit_with_sharded_keys(mesh_ctx):
    """keys physically sharded over 'model' on the sequence dim."""
    q, k, mask, w1, b1, w2, al = _data(l=64)
    k_s = jax.device_put(k, mesh_ctx.sharding(None, "model", None))
    m_s = jax.device_put(mask, mesh_ctx.sharding(None, "model"))
    pooled_cp, _ = jax.jit(
        lambda *a: din_attention_cp(*a, mesh=mesh_ctx.mesh)
    )(q, k_s, m_s, w1, b1, w2, al)
    pooled, _ = din_attention_reference(q, k, mask, w1, b1, w2, al)
    np.testing.assert_allclose(np.asarray(pooled_cp), np.asarray(pooled), rtol=1e-5, atol=1e-6)


def test_softmax_cp_matches_single_device(mesh_ctx):
    rng = np.random.default_rng(1)
    b, l, d = 8, 32, 8
    q = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, l, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, l, d)).astype(np.float32))
    lengths = rng.integers(1, l + 1, size=(b,))
    mask = jnp.asarray((np.arange(l)[None, :] < lengths[:, None]).astype(np.float32))
    got = softmax_attention_cp(q, k, v, mask, mesh_ctx.mesh)
    # single-device reference
    logits = np.einsum("bd,bld->bl", np.asarray(q), np.asarray(k)) / np.sqrt(d)
    logits = np.where(np.asarray(mask) > 0, logits, -1e30)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w * np.asarray(mask)
    want = np.einsum("bl,bld->bd", w / w.sum(-1, keepdims=True), np.asarray(v))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_softmax_cp_all_padded_row(mesh_ctx):
    """A row with zero valid steps returns zeros, not NaN."""
    rng = np.random.default_rng(2)
    b, l, d = 4, 16, 8
    q = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, l, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, l, d)).astype(np.float32))
    mask = jnp.zeros((b, l), jnp.float32).at[1:].set(1.0)
    got = np.asarray(softmax_attention_cp(q, k, v, mask, mesh_ctx.mesh))
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got[0], 0.0, atol=1e-7)
