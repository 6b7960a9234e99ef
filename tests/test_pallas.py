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

    def test_gradients_with_alpha_multi_tile(self):
        # fused bwd kernel (din_attention_bwd_fused): PReLU slopes, both
        # cotangents, a batch that spans several grid tiles + padding
        args = self._data(b=70, l=12, d=8, h=16)
        rng = np.random.default_rng(7)
        alpha = jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * 0.3)

        def loss_fused(q, k, w1, b1, w2, al):
            p, s = din_attention_fused(
                q, k, args[2], w1, b1, w2, al, block_b=32, interpret=True
            )
            return jnp.sum(jnp.tanh(p)) + jnp.sum(s * s)

        def loss_ref(q, k, w1, b1, w2, al):
            p, s = din_attention_reference(q, k, args[2], w1, b1, w2, al)
            return jnp.sum(jnp.tanh(p)) + jnp.sum(s * s)

        inputs = (args[0], args[1], args[3], args[4], args[5], alpha)
        g1 = jax.grad(loss_fused, argnums=tuple(range(6)))(*inputs)
        g2 = jax.grad(loss_ref, argnums=tuple(range(6)))(*inputs)
        for x, y in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=2e-3, atol=2e-5
            )


class TestSenetBilinearKernel:
    def _data(self, b=16, f=6, d=8, r=2, seed=5):
        rng = np.random.default_rng(seed)
        emb = jnp.asarray(rng.normal(size=(b, f, d)).astype(np.float32))
        w1 = jnp.asarray(rng.normal(size=(f, r)).astype(np.float32) * 0.4)
        b1 = jnp.asarray(rng.normal(size=(r,)).astype(np.float32) * 0.1)
        w2 = jnp.asarray(rng.normal(size=(r, f)).astype(np.float32) * 0.4)
        b2 = jnp.asarray(rng.normal(size=(f,)).astype(np.float32) * 0.1)
        wb = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.3)
        return emb, w1, w2, wb, b1, b2

    @pytest.mark.parametrize("b", [16, 11])  # 11 → padding path
    def test_matches_reference(self, b):
        from tpurec.ops.pallas.kernels import (
            senet_bilinear_fused,
            senet_bilinear_reference,
        )

        args = self._data(b=b)
        got = senet_bilinear_fused(*args, interpret=True)
        want = senet_bilinear_reference(*args)
        assert got.shape == (b, 15, 8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=1e-5)

    def test_matches_module_pair_order(self):
        """Kernel pair layout must equal SENet→BilinearInteraction('all')."""
        from tpurec.ops.interactions import BilinearInteraction, SENet
        from tpurec.ops.pallas.kernels import senet_bilinear_fused

        emb, w1, w2, wb, b1, b2 = self._data()
        se = SENet(reduction=3)
        sv = {"params": {"squeeze": {"kernel": w1, "bias": b1},
                         "excite": {"kernel": w2, "bias": b2}}}
        v = se.apply(sv, emb)
        bi = BilinearInteraction(mode="all")
        want = bi.apply({"params": {"w": wb}}, v)
        got = senet_bilinear_fused(emb, w1, w2, wb, b1, b2, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=1e-5)

    def test_gradients(self):
        from tpurec.ops.pallas.kernels import (
            senet_bilinear_fused,
            senet_bilinear_reference,
        )

        args = self._data(b=8, f=4, d=4)
        g1 = jax.grad(
            lambda *a: jnp.sum(senet_bilinear_fused(*a, interpret=True) ** 2),
            argnums=tuple(range(6)),
        )(*args)
        g2 = jax.grad(
            lambda *a: jnp.sum(senet_bilinear_reference(*a) ** 2),
            argnums=tuple(range(6)),
        )(*args)
        for x, y in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-3, atol=1e-5)


class TestCapsuleRoutingKernel:
    def _data(self, b=16, l=12, d=8, e=8, k=4, seed=6):
        rng = np.random.default_rng(seed)
        behavior = jnp.asarray(rng.normal(size=(b, l, d)).astype(np.float32))
        lengths = rng.integers(1, l + 1, size=(b,))
        mask = jnp.asarray((np.arange(l)[None, :] < lengths[:, None]).astype(np.float32))
        s = jnp.asarray(rng.normal(size=(d, e)).astype(np.float32) * 0.3)
        logits0 = jnp.asarray(rng.normal(size=(b, k, l)).astype(np.float32))
        return behavior, mask, s, logits0

    @pytest.mark.parametrize("b", [16, 9])  # 9 → padding path
    def test_matches_reference(self, b):
        from tpurec.ops.pallas.kernels import (
            capsule_routing_fused,
            capsule_routing_reference,
        )

        args = self._data(b=b)
        got = capsule_routing_fused(*args, num_iters=3, interpret=True)
        want = capsule_routing_reference(*args, num_iters=3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=1e-5)

    def test_matches_module(self):
        """Same math as CapsuleRouting('shared') given its logit init."""
        from tpurec.ops.capsule import CapsuleRouting
        from tpurec.ops.pallas.kernels import capsule_routing_fused

        behavior, mask, s, _ = self._data()
        b, _, _ = behavior.shape
        k = 4
        mod = CapsuleRouting(num_capsules=k, dim=8, mode="shared")
        caps, _ = mod.apply({"params": {"S": s}}, behavior, mask)
        logits0 = jnp.broadcast_to(
            jax.random.normal(jax.random.key(7), (1, k, behavior.shape[1]), jnp.float32),
            (b, k, behavior.shape[1]),
        )
        got = capsule_routing_fused(behavior, mask, s, logits0, num_iters=3, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(caps), rtol=2e-4, atol=1e-5)

    def test_gradients(self):
        from tpurec.ops.pallas.kernels import (
            capsule_routing_fused,
            capsule_routing_reference,
        )

        behavior, mask, s, logits0 = self._data(b=8, l=6, d=4, e=4)
        g1 = jax.grad(
            lambda beh, ss: jnp.sum(
                capsule_routing_fused(beh, mask, ss, logits0, num_iters=3, interpret=True) ** 2
            ),
            argnums=(0, 1),
        )(behavior, s)
        g2 = jax.grad(
            lambda beh, ss: jnp.sum(
                capsule_routing_reference(beh, mask, ss, logits0, num_iters=3) ** 2
            ),
            argnums=(0, 1),
        )(behavior, s)
        for x, y in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-3, atol=1e-5)

    def test_gradients_logits0_and_padding(self):
        """Fused-backward dl0 parity (the softmax-chain cotangent) plus the
        block-padding path (b=9 not a multiple of block_b)."""
        from tpurec.ops.pallas.kernels import (
            capsule_routing_fused,
            capsule_routing_reference,
        )

        behavior, mask, s, logits0 = self._data(b=9, l=6, d=4, e=4)
        g1 = jax.grad(
            lambda beh, ss, l0: jnp.sum(
                jnp.cos(capsule_routing_fused(beh, mask, ss, l0, num_iters=3, interpret=True))
            ),
            argnums=(0, 1, 2),
        )(behavior, s, logits0)
        g2 = jax.grad(
            lambda beh, ss, l0: jnp.sum(
                jnp.cos(capsule_routing_reference(beh, mask, ss, l0, num_iters=3))
            ),
            argnums=(0, 1, 2),
        )(behavior, s, logits0)
        for x, y in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-3, atol=1e-5)
