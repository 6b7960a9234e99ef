"""Micro-bench of embedding gather/scatter primitives at the FM bench shape
(213k ids into a 2.08M x 32 fp32 table) — picks the design for the fused
sparse-update path."""

import time, json, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

V, D, N = 2_080_008, 32, 8192 * 26


def timed(name, fn, *args, iters=20, warmup=5):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf[0] if leaf.ndim > 1 else leaf[:1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf[0] if leaf.ndim > 1 else leaf[:1]))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.3f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    ids64 = jnp.asarray(rng.integers(0, V - 8, size=(N,)))
    ids32 = ids64.astype(jnp.int32)
    tbl = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))

    timed("gather_int64", jax.jit(lambda t, i: jnp.take(t, i, axis=0)), tbl, ids64)
    timed("gather_int32", jax.jit(lambda t, i: jnp.take(t, i, axis=0)), tbl, ids32)
    sids = jnp.sort(ids32)
    timed("gather_sorted_hint", jax.jit(
        lambda t, i: jnp.take(t, i, axis=0, indices_are_sorted=True)), tbl, sids)
    timed("sort_ids32", jax.jit(lambda i: jnp.sort(i)), ids32)
    timed("argsort_ids32", jax.jit(lambda i: jnp.argsort(i)), ids32)
    timed("scatter_add_plain", jax.jit(lambda t, i, u: t.at[i].add(u)), tbl, ids32, g)
    perm = jnp.argsort(ids32)
    g_s = jnp.take(g, perm, axis=0)
    timed("permute_grads(batch gather 213k x 213k)",
          jax.jit(lambda x, p: jnp.take(x, p, axis=0)), g, perm)
    timed("scatter_add_sorted", jax.jit(
        lambda t, i, u: t.at[i].add(u, indices_are_sorted=True)), tbl, sids, g_s)
    # segment-dedup then unique scatter
    uniq_mask = jnp.concatenate([jnp.ones(1, bool), sids[1:] != sids[:-1]])
    seg = jnp.cumsum(uniq_mask) - 1

    @jax.jit
    def seg_then_scatter(t, sids, seg, g_s):
        agg = jax.ops.segment_sum(g_s, seg, num_segments=N)
        first_pos = jax.ops.segment_min(
            jnp.arange(N, dtype=jnp.int32), seg, num_segments=N)
        rows = jnp.where(jnp.arange(N) < seg[-1] + 1,
                         jnp.take(sids, jnp.clip(first_pos, 0, N - 1)), V - 1)
        return t.at[rows].add(agg, indices_are_sorted=True, unique_indices=True)

    timed("segsum_then_unique_scatter", seg_then_scatter, tbl, sids, seg, g_s)
    # dense one-hot matmul grad per 80k field (26 fields)
    f_ids = ids32.reshape(8192, 26) % 80000

    @jax.jit
    def onehot_grad(g):
        gf = g.reshape(8192, 26, D)
        outs = []
        for f in range(26):
            oh = jax.nn.one_hot(f_ids[:, f], 80000, dtype=jnp.bfloat16)
            outs.append(jax.lax.dot_general(
                oh, gf[:, f].astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32))
        return jnp.stack(outs)

    timed("onehot_matmul_grad_26x80k", onehot_grad, g, iters=5)


if __name__ == "__main__":
    main()
