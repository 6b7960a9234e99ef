"""Microbenchmark: fused Pallas kernels vs their pure-JAX (XLA) references
on the real TPU chip. Run: python benchmarks/kernel_bench.py [name ...]

Timing follows CLAUDE.md's rules: warm ≥10 iterations to absorb compiles and
retraces, then force a full-dependency host fetch inside the timed region.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, iters=30, warmup=12):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    # full-dependency host fetch (axon tunnel dispatches beyond block_until_ready)
    leaves = jax.tree_util.tree_leaves(out)
    _ = float(jnp.sum(leaves[0]))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_cin():
    from tpurec.ops.pallas.kernels import cin_fused, cin_reference

    b, f, d = 4096, 26, 32
    sizes = (128, 128)
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(b, f, d)).astype(np.float32))
    h = f
    weights = []
    for s in sizes:
        weights.append(jnp.asarray(rng.normal(size=(h * f, s)).astype(np.float32) * 0.1))
        h = s
    weights = tuple(weights)

    ref = jax.jit(lambda e, w: cin_reference(e, w))
    fused = jax.jit(lambda e, w: cin_fused(e, w))
    # MXU default precision (bf16 passes) + a different contraction order ⇒
    # ~1e-2 relative drift on TPU; interpret-mode tests pin the exact math.
    got, want = np.asarray(fused(emb, weights)), np.asarray(ref(emb, weights))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=0.5 + 0.02 * np.abs(want).mean())
    t_ref = _time(ref, emb, weights)
    t_fused = _time(fused, emb, weights)
    print(f"cin       B={b} F={f} D={d} S={sizes}: xla {t_ref*1e3:.3f} ms  "
          f"pallas {t_fused*1e3:.3f} ms  speedup {t_ref/t_fused:.2f}x")


def bench_din():
    from tpurec.ops.pallas.kernels import din_attention_fused, din_attention_reference

    b, l, d, h = 4096, 64, 32, 36
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, l, d)).astype(np.float32))
    mask = jnp.ones((b, l), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(4 * d, h)).astype(np.float32) * 0.1)
    b1 = jnp.zeros((h,), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(h,)).astype(np.float32) * 0.1)
    al = jnp.full((h,), 0.25, jnp.float32)
    ref = jax.jit(lambda *a: din_attention_reference(*a))
    fused = jax.jit(lambda *a: din_attention_fused(*a))
    t_ref = _time(ref, q, k, mask, w1, b1, w2, al)
    t_fused = _time(fused, q, k, mask, w1, b1, w2, al)
    print(f"din_attn  B={b} L={l} D={d} H={h}: xla {t_ref*1e3:.3f} ms  "
          f"pallas {t_fused*1e3:.3f} ms  speedup {t_ref/t_fused:.2f}x")


BENCHES = {"cin": bench_cin, "din": bench_din}

if __name__ == "__main__":
    names = sys.argv[1:] or list(BENCHES)
    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")
    for n in names:
        BENCHES[n]()
