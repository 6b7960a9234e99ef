"""Microbenchmark: fused Pallas kernels vs their pure-JAX (XLA) references
on the real TPU chip. Run: python benchmarks/kernel_bench.py [name ...]

Covers every fused kernel in tpurec.ops.pallas (SURVEY §2.10 kernel table).
Timing follows CLAUDE.md's rules: warm ≥10 iterations to absorb compiles and
retraces, then force a full-dependency host fetch inside the timed region.
Writes benchmarks/kernel_bench_results.json (one entry per kernel) so the
speedups are recorded artifacts, not prose claims.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

RESULTS_PATH = os.path.join(os.path.dirname(__file__), "kernel_bench_results.json")


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


def _entry(name, shape, t_ref, t_fused):
    e = {
        "shape": shape,
        "xla_ms": round(t_ref * 1e3, 4),
        "pallas_ms": round(t_fused * 1e3, 4),
        "speedup": round(t_ref / t_fused, 3),
    }
    print(f"{name:12s} {shape}: xla {e['xla_ms']:.3f} ms  "
          f"pallas {e['pallas_ms']:.3f} ms  speedup {e['speedup']:.2f}x")
    return e


def bench_fm():
    from tpurec.ops.pallas.kernels import fm_second_order_fused, fm_second_order_reference

    b, f, d = 8192, 26, 32
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(b, f, d)).astype(np.float32))
    ref = jax.jit(fm_second_order_reference)
    fused = jax.jit(fm_second_order_fused)
    np.testing.assert_allclose(
        np.asarray(fused(emb)), np.asarray(ref(emb)), rtol=2e-2, atol=0.5
    )
    return _entry("fm", f"B={b} F={f} D={d}", _time(ref, emb), _time(fused, emb))


def bench_cross():
    from tpurec.ops.pallas.kernels import cross_network_reference, cross_network_stack

    b, d, layers = 8192, 416, 3  # d = F·D for 26 fields × dim 16
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    weights = jnp.asarray(rng.normal(size=(layers, d)).astype(np.float32) * 0.1)
    biases = jnp.zeros((layers, d), jnp.float32)
    ref = jax.jit(lambda x, w, bs: cross_network_reference(x, w, bs))
    fused = jax.jit(lambda x, w, bs: cross_network_stack(x, w, bs))
    np.testing.assert_allclose(
        np.asarray(fused(x0, weights, biases)),
        np.asarray(ref(x0, weights, biases)),
        rtol=2e-2, atol=0.5,
    )
    return _entry(
        "cross", f"B={b} D={d} L={layers}",
        _time(ref, x0, weights, biases), _time(fused, x0, weights, biases),
    )


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
    return _entry(
        "cin", f"B={b} F={f} D={d} S={sizes}",
        _time(ref, emb, weights), _time(fused, emb, weights),
    )


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
    return _entry(
        "din_attn", f"B={b} L={l} D={d} H={h}",
        _time(ref, q, k, mask, w1, b1, w2, al),
        _time(fused, q, k, mask, w1, b1, w2, al),
    )


def bench_senet():
    from tpurec.ops.pallas.kernels import (
        senet_bilinear_fused,
        senet_bilinear_reference,
    )

    b, f, d = 8192, 26, 32
    rng = np.random.default_rng(3)
    emb = jnp.asarray(rng.normal(size=(b, f, d)).astype(np.float32))
    r = max(1, f // 3)
    w1 = jnp.asarray(rng.normal(size=(f, r)).astype(np.float32) * 0.3)
    w2 = jnp.asarray(rng.normal(size=(r, f)).astype(np.float32) * 0.3)
    wb = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.1)
    ref = jax.jit(lambda *a: senet_bilinear_reference(*a))
    fused = jax.jit(lambda *a: senet_bilinear_fused(*a))
    np.testing.assert_allclose(
        np.asarray(fused(emb, w1, w2, wb)),
        np.asarray(ref(emb, w1, w2, wb)),
        rtol=2e-2, atol=0.5,
    )
    return _entry(
        "senet_bil", f"B={b} F={f} D={d}",
        _time(ref, emb, w1, w2, wb), _time(fused, emb, w1, w2, wb),
    )


def bench_capsule():
    from tpurec.ops.pallas.kernels import (
        capsule_routing_fused,
        capsule_routing_reference,
    )

    b, l, d, k, iters = 4096, 64, 64, 4, 3
    rng = np.random.default_rng(4)
    behavior = jnp.asarray(rng.normal(size=(b, l, d)).astype(np.float32))
    mask = jnp.ones((b, l), jnp.float32)
    s = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.2)
    logits0 = jnp.asarray(rng.normal(size=(b, k, l)).astype(np.float32))
    ref = jax.jit(lambda *a: capsule_routing_reference(*a, num_iters=iters))
    fused = jax.jit(lambda *a: capsule_routing_fused(*a, num_iters=iters))
    np.testing.assert_allclose(
        np.asarray(fused(behavior, mask, s, logits0)),
        np.asarray(ref(behavior, mask, s, logits0)),
        rtol=2e-2, atol=0.05,
    )
    return _entry(
        "capsule", f"B={b} L={l} D={d} K={k} it={iters}",
        _time(ref, behavior, mask, s, logits0),
        _time(fused, behavior, mask, s, logits0),
    )


def _sq_loss(fn):
    """Scalar loss over every float output — makes fwd+bwd comparable across
    kernels whose outputs are tuples."""
    def f(*a):
        leaves = jax.tree_util.tree_leaves(fn(*a))
        return sum(
            jnp.sum(x * x) for x in leaves if jnp.issubdtype(x.dtype, jnp.floating)
        )
    return f


def _train_entry(name, shape, ref_fn, fused_fn, args, argnums):
    """fwd+bwd row (VERDICT r2 #3): value_and_grad through the kernel vs
    through its pure-JAX reference. For DIN the backward is itself a Pallas
    kernel (din_attention_bwd_fused); the rest recompute via XLA autodiff of
    the reference inside the custom VJP."""
    ref = jax.jit(jax.value_and_grad(_sq_loss(ref_fn), argnums=argnums))
    fused = jax.jit(jax.value_and_grad(_sq_loss(fused_fn), argnums=argnums))
    lr, gr = ref(*args)
    lf, gf = fused(*args)
    np.testing.assert_allclose(float(lf), float(lr), rtol=5e-2)
    return _entry(name, shape, _time(ref, *args), _time(fused, *args))


def bench_fm_train():
    from tpurec.ops.pallas.kernels import fm_second_order_fused, fm_second_order_reference

    b, f, d = 8192, 26, 32
    emb = jnp.asarray(np.random.default_rng(0).normal(size=(b, f, d)).astype(np.float32))
    return _train_entry(
        "fm_train", f"B={b} F={f} D={d}",
        fm_second_order_reference, fm_second_order_fused, (emb,), 0,
    )


def bench_cross_train():
    from tpurec.ops.pallas.kernels import cross_network_reference, cross_network_stack

    b, d, layers = 8192, 416, 3
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    weights = jnp.asarray(rng.normal(size=(layers, d)).astype(np.float32) * 0.1)
    biases = jnp.zeros((layers, d), jnp.float32)
    return _train_entry(
        "cross_train", f"B={b} D={d} L={layers}",
        lambda x, w, bs: cross_network_reference(x, w, bs),
        lambda x, w, bs: cross_network_stack(x, w, bs),
        (x0, weights, biases), (0, 1, 2),
    )


def bench_din_train():
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
    return _train_entry(
        "din_train", f"B={b} L={l} D={d} H={h}",
        lambda *a: din_attention_reference(*a),
        lambda *a: din_attention_fused(*a),
        (q, k, mask, w1, b1, w2, al), (0, 1, 3, 4, 5, 6),
    )


def bench_cin_train():
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
    return _train_entry(
        "cin_train", f"B={b} F={f} D={d} S={sizes}",
        lambda e, w: cin_reference(e, w),
        lambda e, w: cin_fused(e, w),
        (emb, weights), (0, 1),
    )


def bench_senet_train():
    from tpurec.ops.pallas.kernels import (
        senet_bilinear_fused,
        senet_bilinear_reference,
    )

    b, f, d = 8192, 26, 32
    rng = np.random.default_rng(3)
    emb = jnp.asarray(rng.normal(size=(b, f, d)).astype(np.float32))
    r = max(1, f // 3)
    w1 = jnp.asarray(rng.normal(size=(f, r)).astype(np.float32) * 0.3)
    w2 = jnp.asarray(rng.normal(size=(r, f)).astype(np.float32) * 0.3)
    wb = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.1)
    return _train_entry(
        "senet_train", f"B={b} F={f} D={d}",
        lambda *a: senet_bilinear_reference(*a),
        lambda *a: senet_bilinear_fused(*a),
        (emb, w1, w2, wb), (0, 1, 2, 3),
    )


def bench_capsule_train():
    from tpurec.ops.pallas.kernels import (
        capsule_routing_fused,
        capsule_routing_reference,
    )

    b, l, d, k, iters = 4096, 64, 64, 4, 3
    rng = np.random.default_rng(4)
    behavior = jnp.asarray(rng.normal(size=(b, l, d)).astype(np.float32))
    mask = jnp.ones((b, l), jnp.float32)
    s = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.2)
    logits0 = jnp.asarray(rng.normal(size=(b, k, l)).astype(np.float32))
    return _train_entry(
        "capsule_train", f"B={b} L={l} D={d} K={k} it={iters}",
        lambda *a: capsule_routing_reference(*a, num_iters=iters),
        lambda *a: capsule_routing_fused(*a, num_iters=iters),
        (behavior, mask, s, logits0), (0, 2),
    )


BENCHES = {
    "fm": bench_fm,
    "cross": bench_cross,
    "cin": bench_cin,
    "din": bench_din,
    "senet": bench_senet,
    "capsule": bench_capsule,
    "fm_train": bench_fm_train,
    "cross_train": bench_cross_train,
    "cin_train": bench_cin_train,
    "senet_train": bench_senet_train,
    "din_train": bench_din_train,
    "capsule_train": bench_capsule_train,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(BENCHES)
    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")
    results = {}
    if os.path.exists(RESULTS_PATH):
        try:
            with open(RESULTS_PATH) as f:
                results = json.load(f)
        except Exception:
            results = {}
    for n in names:
        try:
            results[n] = BENCHES[n]()
        except Exception as e:  # record the failure, keep the rest
            print(f"{n}: FAILED ({type(e).__name__}: {e})")
            results[n] = {"error": f"{type(e).__name__}: {e}"}
    results["_meta"] = {"device": str(jax.devices()[0]), "backend": jax.default_backend()}
    with open(RESULTS_PATH, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {RESULTS_PATH}")
