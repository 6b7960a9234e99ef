"""Attribute the FM train-step budget (VERDICT r2 'What's weak' #4).

Times isolated jitted programs at the exact bench.py FM shapes
(B=8192, F=26, D=32, 26x80k = 2.08M-row shared table) so each HBM-traffic
component of the step is measured on its own:

    full trainer step | fwd | fwd+bwd | bwd+adam (no metrics) |
    v-table scatter-grad | w-table scatter-grad | dense adam on v | metrics

Prints one JSON block. Run on the real TPU:  python benchmarks/fm_profile.py
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
    import optax

    from bench import _checksum, _fm_info, _make_batch
    from tpurec.config import (
        EmbeddingConfig,
        ExperimentConfig,
        ModelConfig,
        OptimizerConfig,
        TrainConfig,
    )
    from tpurec.train import Trainer

    B = 8192
    info = _fm_info()
    cfg = ExperimentConfig(
        model=ModelConfig(name="fm", embedding=EmbeddingConfig(dim=32)),
        train=TrainConfig(
            batch_size=B, loss="bce", log_every_steps=0,
            optimizer=OptimizerConfig(learning_rate=1e-3),
        ),
    )
    trainer = Trainer(cfg, info)
    batch_np = _make_batch(info, B, seed=1)
    state = trainer.init_state(batch_np)
    batch = trainer.device_batch(batch_np)
    mstate = trainer.metrics.init()

    results = {}

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
        print(f"{name}: {dt*1e3:.3f} ms", flush=True)
        return out

    # 1. full trainer step (threads state like bench.py)
    s, m = state, mstate
    for _ in range(12):
        s, m, _ = trainer.train_step(s, batch, m)
    _checksum(s.params)
    t0 = time.perf_counter()
    for _ in range(20):
        s, m, _ = trainer.train_step(s, batch, m)
    _checksum(s.params)
    results["full_step"] = round((time.perf_counter() - t0) / 20 * 1e3, 3)
    print(f"full_step: {results['full_step']} ms", flush=True)

    # pieces reusing the trainer's model/loss (state was donated — use the
    # threaded copy)
    model = trainer.model
    loss_obj = trainer.loss_fn
    params = s.params

    def loss_fn(p):
        out = model.apply({"params": p}, batch, train=True,
                          rngs={"dropout": jax.random.key(0)})
        loss, _ = loss_obj(out, batch)
        return loss, out

    @jax.jit
    def fwd(p):
        return loss_fn(p)[0]

    @jax.jit
    def fwd_bwd(p):
        return jax.grad(lambda q: loss_fn(q)[0])(p)

    tx = trainer.tx
    opt_state = jax.jit(tx.init)(params)

    @jax.jit
    def bwd_adam(p, o):
        g = jax.grad(lambda q: loss_fn(q)[0])(p)
        updates, o = tx.update(g, o, p)
        return optax.apply_updates(p, updates), o

    @jax.jit
    def metrics_only(p, m):
        _, out = loss_fn(p)
        return trainer.metrics.update(
            m, loss=(jnp.float32(0.3),), **trainer._metric_updates(out, batch)
        )

    timed("fwd", fwd, params)
    timed("fwd_bwd", fwd_bwd, params)
    o2 = bwd_adam(params, opt_state)
    timed("bwd_adam_no_metrics", lambda p: bwd_adam(p, o2[1])[0], params)
    timed("metrics_only", metrics_only, params, mstate)

    # isolated table ops at the same shapes
    v = params["v"]["embedding"]
    w = params["w"]["w"]["embedding"]
    ids = jnp.stack([batch[n] for n in info.feature_names], axis=1)  # (B, 26)

    @jax.jit
    def v_scatter(tbl):
        return jax.grad(lambda t: jnp.sum(jnp.take(t, ids, axis=0) ** 2))(tbl)

    @jax.jit
    def w_scatter(tbl):
        return jax.grad(lambda t: jnp.sum(jnp.take(t, ids, axis=0) ** 2))(tbl)

    adam_v = optax.adam(1e-3)
    ov = jax.jit(adam_v.init)(v)
    gv = v_scatter(v)

    @jax.jit
    def adam_dense(t, o, g):
        u, o = adam_v.update(g, o, t)
        return optax.apply_updates(t, u), o

    timed("v_table_scatter_grad", v_scatter, v)
    timed("w_table_scatter_grad", w_scatter, w)
    timed("adam_dense_v_table", lambda t: adam_dense(t, ov, gv)[0], v)

    # roofline: bytes over HBM for the dense-table adam pass
    bytes_adam = v.size * 4 * 7 + w.size * 4 * 7  # p,m,v r+w (6) + grad r
    results["_roofline"] = {
        "adam_pass_bytes": int(bytes_adam),
        "adam_pass_ms_at_819GBps": round(bytes_adam / 819e9 * 1e3, 3),
        "v_shape": list(v.shape),
        "w_shape": list(w.shape),
    }
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
