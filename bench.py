"""Benchmark harness: train-step throughput on the real chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "examples/s", "vs_baseline": N}

The reference publishes no throughput numbers (BASELINE.md) — its training is
a single-process eager TF2 loop on a laptop CPU. ``vs_baseline`` is therefore
measured against this machine's own CPU running the *same* jitted train step
(the strongest single-host software baseline available), i.e. the TPU speedup
delivered by the framework.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _bench_model():
    """Flagship bench model: DIN if available (behavior-sequence ranking,
    the reference's hot path — SURVEY §3.5), else DeepFM."""
    from tpurec.config import EmbeddingConfig, ModelConfig
    from tpurec.data.schema import DataInfo
    from tpurec.models import MODEL_REGISTRY, build_model
    from tpurec.models.registry import _ensure_populated

    _ensure_populated()
    seq_len = 64
    if "din" in MODEL_REGISTRY:
        info = DataInfo.from_dims(
            ["user_tag", "item_id", "item_tag"],
            [1000, 20000, 500],
            sequence_names=["history"],
            max_seq_length=seq_len,
            padding_index=0,
        )
        name = "din"
        params = {
            "user_features": ["user_tag"],
            "item_features": ["item_id", "item_tag"],
            "sequence_features": ["history"],
        }
    else:
        info = DataInfo.from_dims(
            [f"f{i}" for i in range(20)], [5000] * 20
        )
        name, params = "deepfm", {}
    model = build_model(
        ModelConfig(name=name, params=params, embedding=EmbeddingConfig(dim=32)), info
    )
    return name, model, info, seq_len


def _make_batch(info, batch_size, seq_len, seed=0):
    rng = np.random.default_rng(seed)
    batch = {
        n: rng.integers(off, off + dim, size=(batch_size,))
        for n, off, dim in zip(info.feature_names, info.feature_offsets, info.feature_dims)
    }
    for sname in info.sequence_names:
        seq = rng.integers(1, info.total_dims // 2, size=(batch_size, seq_len))
        lengths = rng.integers(seq_len // 4, seq_len + 1, size=(batch_size,))
        mask = np.arange(seq_len)[None, :] < lengths[:, None]
        batch[sname] = np.where(mask, seq, 0)
    batch["label"] = rng.integers(0, 2, size=(batch_size,)).astype(np.float32)
    return batch


def _measure(batch_size=8192, warmup=12, iters=20) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    name, model, info, seq_len = _bench_model()
    batch = {k: jnp.asarray(v) for k, v in _make_batch(info, batch_size, seq_len).items()}
    variables = model.init(jax.random.key(0), batch)
    from flax import linen as nn

    variables = nn.unbox(variables)
    params = variables.pop("params")
    model_state = dict(variables)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            out = model.apply({"params": p, **model_state}, batch, train=True,
                              rngs={"dropout": jax.random.key(0)},
                              mutable=list(model_state.keys()))[0] if model_state else \
                  model.apply({"params": p}, batch, train=True,
                              rngs={"dropout": jax.random.key(0)})
            logit = out["logit"] if "logit" in out else out["output"]
            return jnp.mean(
                optax.sigmoid_binary_cross_entropy(
                    logit.reshape(-1).astype(jnp.float32), batch["label"]
                )
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def checksum(params):
        # host fetch that transitively depends on EVERY update in the chain —
        # the axon TPU tunnel acknowledges block_until_ready before remote
        # execution finishes, so only a data-dependent fetch measures honestly
        leaf = jax.tree.leaves(params)[0]
        return float(jnp.sum(leaf[0] if leaf.ndim > 1 else leaf))

    for _ in range(warmup):
        params, opt_state, loss = step(params, opt_state, batch)
    checksum(params)
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state, batch)
    checksum(params)
    dt = time.perf_counter() - t0
    return {
        "model": name,
        "examples_per_s": batch_size * iters / dt,
        "step_ms": dt / iters * 1e3,
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
    }


def main():
    import subprocess

    tpu = _measure()
    # CPU baseline: same step, same shapes, in a subprocess on the host CPU
    try:
        out = subprocess.run(
            [sys.executable, __file__, "--cpu-worker"],
            capture_output=True, text=True, timeout=1800,
            env={**__import__("os").environ, "TPUREC_BENCH_CPU": "1"},
        )
        cpu_rate = float(json.loads(out.stdout.strip().splitlines()[-1])["examples_per_s"])
    except Exception:
        cpu_rate = float("nan")
    vs = tpu["examples_per_s"] / cpu_rate if cpu_rate == cpu_rate else 1.0
    print(
        json.dumps(
            {
                "metric": f"train examples/s/chip ({tpu['model']})",
                "value": round(tpu["examples_per_s"], 1),
                "unit": "examples/s",
                "vs_baseline": round(vs, 2),
                "detail": {
                    "step_ms": round(tpu["step_ms"], 2),
                    "device": tpu["device"],
                    "cpu_examples_per_s": round(cpu_rate, 1) if cpu_rate == cpu_rate else None,
                    "baseline_definition": "same jitted train step on host CPU",
                },
            }
        )
    )


if __name__ == "__main__":
    if "--cpu-worker" in sys.argv:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
        res = _measure(iters=5, warmup=2)
        print(json.dumps(res))
    else:
        main()
