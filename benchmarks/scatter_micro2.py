"""Part 2: does field-blocking (static 80k-row slices per field) make XLA
gather/scatter fast? Plus scatter cost vs table size scaling."""

import time, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

V, D, B, F = 2_080_008, 32, 8192, 26
VF = 80_000


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
    tbl = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    fid = jnp.asarray(rng.integers(0, VF, size=(B, F)).astype(np.int32))  # per-field local
    offs = jnp.arange(F, dtype=jnp.int32) * VF
    gids = fid + offs[None, :]
    g = jnp.asarray(rng.normal(size=(B, F, D)).astype(np.float32))

    @jax.jit
    def field_gather(t, fid):
        outs = []
        for f in range(F):
            sub = jax.lax.dynamic_slice_in_dim(t, f * VF, VF, axis=0)
            outs.append(jnp.take(sub, fid[:, f], axis=0))
        return jnp.stack(outs, axis=1)

    @jax.jit
    def field_scatter(t, fid, g):
        for f in range(F):
            sub = jax.lax.dynamic_slice_in_dim(t, f * VF, VF, axis=0)
            sub = sub.at[fid[:, f]].add(g[:, f])
            t = jax.lax.dynamic_update_slice_in_dim(t, sub, f * VF, axis=0)
        return t

    timed("field_gather_26x8192_from_80k", field_gather, tbl, fid)
    timed("field_scatter_26x8192_into_80k", field_scatter, tbl, fid, g)

    # scatter cost vs table size (8192 updates)
    for v in (80_000, 500_000, 2_000_000):
        t2 = jnp.asarray(rng.normal(size=(v, D)).astype(np.float32))
        i2 = jnp.asarray(rng.integers(0, v, size=(B,)).astype(np.int32))
        g2 = g[:, 0]
        timed(f"scatter_8192_into_{v}", jax.jit(lambda t, i, u: t.at[i].add(u)), t2, i2, g2)
        timed(f"gather_8192_from_{v}", jax.jit(lambda t, i: jnp.take(t, i, axis=0)), t2, i2)
    # scatter cost vs number of updates at 2M table
    t3 = jnp.asarray(rng.normal(size=(2_000_000, D)).astype(np.float32))
    for n in (8192, 65536, 213 * 1024):
        i3 = jnp.asarray(rng.integers(0, 2_000_000, size=(n,)).astype(np.int32))
        g3 = jnp.asarray(rng.normal(size=(n, D)).astype(np.float32))
        timed(f"scatter_{n}_into_2M", jax.jit(lambda t, i, u: t.at[i].add(u)), t3, i3, g3)


if __name__ == "__main__":
    main()
