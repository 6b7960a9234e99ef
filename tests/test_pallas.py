"""Pallas kernel parity tests (interpret mode on CPU; the same kernels
compile natively on the TPU chip — exercised by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurec.ops.pallas.kernels import (
    cin_fused,
    cin_reference,
    cross_network_reference,
    cross_network_stack,
    din_attention_fused,
    din_attention_reference,
    fm_second_order_fused,
    fm_second_order_reference,
)


class TestCinKernel:
    def _data(self, b=16, f=5, d=8, sizes=(6, 4), seed=7):
        rng = np.random.default_rng(seed)
        emb = jnp.asarray(rng.normal(size=(b, f, d)).astype(np.float32))
        h = f
        weights = []
        for s in sizes:
            weights.append(jnp.asarray(rng.normal(size=(h * f, s)).astype(np.float32) * 0.2))
            h = s
        return emb, tuple(weights)

    @pytest.mark.parametrize("b", [16, 13])  # 13 → padding path
    def test_matches_reference(self, b):
        emb, weights = self._data(b=b)
        got = cin_fused(emb, weights, interpret=True)
        want = cin_reference(emb, weights)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)

    def test_gradients(self):
        emb, weights = self._data(b=8, f=4, d=4, sizes=(5, 3))
        g1 = jax.grad(
            lambda e, w: jnp.sum(cin_fused(e, w, interpret=True) ** 2), argnums=(0, 1)
        )(emb, weights)
        g2 = jax.grad(lambda e, w: jnp.sum(cin_reference(e, w) ** 2), argnums=(0, 1))(
            emb, weights
        )
        np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), rtol=1e-4, atol=1e-5)
        for x, y in zip(g1[1], g2[1]):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-5)


class TestFMKernel:
    @pytest.mark.parametrize("b", [8, 100])  # 100 → padding path
    def test_matches_reference(self, b):
        rng = np.random.default_rng(0)
        emb = jnp.asarray(rng.normal(size=(b, 6, 16)).astype(np.float32))
        got = fm_second_order_fused(emb, interpret=True)
        want = fm_second_order_reference(emb)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)

    def test_gradient_matches_reference(self):
        rng = np.random.default_rng(1)
        emb = jnp.asarray(rng.normal(size=(16, 4, 8)).astype(np.float32))
        g1 = jax.grad(lambda e: jnp.sum(fm_second_order_fused(e, interpret=True)))(emb)
        g2 = jax.grad(lambda e: jnp.sum(fm_second_order_reference(e)))(emb)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


class TestCrossKernel:
    def test_matches_reference(self):
        rng = np.random.default_rng(2)
        x0 = jnp.asarray(rng.normal(size=(24, 32)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 32)).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.normal(size=(3, 32)).astype(np.float32) * 0.1)
        got = cross_network_stack(x0, w, b, interpret=True)
        want = cross_network_reference(x0, w, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4)

    def test_gradients(self):
        rng = np.random.default_rng(3)
        x0 = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32) * 0.1)
        g1 = jax.grad(lambda a, c, d: jnp.sum(cross_network_stack(a, c, d, interpret=True)), argnums=(0, 1, 2))(x0, w, b)
        g2 = jax.grad(lambda a, c, d: jnp.sum(cross_network_reference(a, c, d)), argnums=(0, 1, 2))(x0, w, b)
        for x, y in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-4)


class TestDinKernel:
    def _data(self, b=16, l=12, d=8, h=16, seed=4):
        rng = np.random.default_rng(seed)
        query = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
        keys = jnp.asarray(rng.normal(size=(b, l, d)).astype(np.float32))
        lengths = rng.integers(1, l + 1, size=(b,))
        mask = jnp.asarray((np.arange(l)[None, :] < lengths[:, None]).astype(np.float32))
        w1 = jnp.asarray(rng.normal(size=(4 * d, h)).astype(np.float32) * 0.2)
        b1 = jnp.asarray(rng.normal(size=(h,)).astype(np.float32) * 0.1)
        w2 = jnp.asarray(rng.normal(size=(h,)).astype(np.float32) * 0.2)
        return query, keys, mask, w1, b1, w2

    def test_matches_reference(self):
        args = self._data()
        pooled, scores = din_attention_fused(*args, interpret=True)
        pooled_ref, scores_ref = din_attention_reference(*args)
        np.testing.assert_allclose(np.asarray(scores), np.asarray(scores_ref), rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(pooled), np.asarray(pooled_ref), rtol=2e-4, atol=1e-5)

    def test_padded_batch(self):
        args = self._data(b=13)  # forces batch padding
        pooled, _ = din_attention_fused(*args, interpret=True)
        pooled_ref, _ = din_attention_reference(*args)
        np.testing.assert_allclose(np.asarray(pooled), np.asarray(pooled_ref), rtol=2e-4, atol=1e-5)

    def test_gradients(self):
        args = self._data(b=8, l=6, d=4, h=8)

        def loss_fused(q, k, w1, b1, w2):
            p, s = din_attention_fused(q, k, args[2], w1, b1, w2, interpret=True)
            return jnp.sum(p * p) + jnp.sum(s)

        def loss_ref(q, k, w1, b1, w2):
            p, s = din_attention_reference(q, k, args[2], w1, b1, w2)
            return jnp.sum(p * p) + jnp.sum(s)

        inputs = (args[0], args[1], args[3], args[4], args[5])
        g1 = jax.grad(loss_fused, argnums=tuple(range(5)))(*inputs)
        g2 = jax.grad(loss_ref, argnums=tuple(range(5)))(*inputs)
        for x, y in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-3, atol=1e-5)
