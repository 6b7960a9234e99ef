"""Attribute the DIN train-step budget at the bench shapes (VERDICT r3 #8:
35.9% of peak HBM bandwidth, step 9.83 ms, of which embedding gather+grad is
5.32 ms). Times isolated jitted programs at B=8192, L=64, 21.5k-row table:

    fwd gather (take) | bwd scatter (.at[].add) | gather+grad (both) |
    packed-view gather | one-hot segment-sum scatter (MXU) |
    fused attention fwd / fwd+bwd | full hand-rolled step

Run on the real TPU: python benchmarks/din_profile.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import _checksum, _din_model, _make_batch

    model, info, seq_len = _din_model()
    B = 8192
    batch = {k: jnp.asarray(v) for k, v in _make_batch(info, B, seq_len).items()}
    from tpurec.embedding.ops import pad_vocab

    V = pad_vocab(info.total_dims, 1)  # the table shape SharedEmbedding makes
    D = 32
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    ids = jnp.concatenate(
        [batch[n].reshape(B, -1) for n in info.feature_names]
        + [batch[s] for s in info.sequence_names],
        axis=1,
    ).reshape(-1).astype(jnp.int32)
    n_ids = int(ids.shape[0])
    print(f"V={V} n_ids={n_ids}", flush=True)

    results = {"V": V, "n_ids": n_ids}
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "din_profile_results.json"
    )

    def timed(name, fn, *args, iters=20, warmup=8):
        out = None
        for _ in range(warmup):
            out = fn(*args)
        _checksum(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _checksum(out)
        dt = (time.perf_counter() - t0) / iters
        results[name] = round(dt * 1e3, 3)
        with open(out_path, "w") as f:  # incremental: crashes keep data
            json.dump(results, f, indent=2)
        print(f"{name}: {dt*1e3:.3f} ms", flush=True)
        return out

    @jax.jit
    def fwd_take(t, i):
        return jnp.take(t, i, axis=0)

    rows = timed("fwd_take", fwd_take, table, ids)

    @jax.jit
    def bwd_scatter(t, i, g):
        return jnp.zeros_like(t).at[i].add(g)

    timed("bwd_scatter_at_add", bwd_scatter, table, ids, rows)

    @jax.jit
    def gather_and_grad(t, i):
        return jax.grad(lambda tt: jnp.sum(jnp.take(tt, i, axis=0) ** 2))(t)

    timed("gather_and_grad", gather_and_grad, table, ids)

    from tpurec.ops.pallas.embedding_update import packed_take

    @jax.jit
    def packed(t, i):
        return packed_take(t, i)

    timed("packed_take", packed, table, ids)

    # fwd+bwd THROUGH the packed view: the autodiff scatter lands on the
    # (V/k, 128) view — k-fold fewer destination rows for XLA's row loop —
    # while the lane select/reduce differentiates as vectorized masks+matmul
    @jax.jit
    def packed_gather_and_grad(t, i):
        return jax.grad(lambda tt: jnp.sum(packed_take(tt, i) ** 2))(t)

    timed("packed_gather_and_grad", packed_gather_and_grad, table, ids)

    # one-hot segment-sum scatter on the MXU: G = onehot(ids)^T @ g computed
    # in (8192-id, full-vocab) blocks — vocab is small enough that the
    # one-hot matmul beats a row-loop scatter if XLA's isn't already fused
    Vp = (V + 127) // 128 * 128

    @jax.jit
    def onehot_scatter(i, g):
        n = i.shape[0]
        blk = 8192
        out = jnp.zeros((Vp, D), jnp.float32)

        def body(c, acc):
            sl_i = jax.lax.dynamic_slice(i, (c * blk,), (blk,))
            sl_g = jax.lax.dynamic_slice(g, (c * blk, 0), (blk, D))
            oh = (sl_i[:, None] == jnp.arange(Vp)[None, :]).astype(jnp.bfloat16)
            return acc + jax.lax.dot_general(
                oh, sl_g.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        return jax.lax.fori_loop(0, n // blk, body, out)

    timed("onehot_segment_scatter", onehot_scatter, ids, rows)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
