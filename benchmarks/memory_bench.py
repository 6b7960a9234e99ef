"""Large-vocab optimizer-memory demonstration (VERDICT r3 item #9).

Runs REAL sparse-mode train steps at an 8M-row shared id space (dim 64) on
CPU and records the measured per-array optimizer-state bytes for each table
optimizer, against dense Adam's 2·V·D fp32 moments:

    adam            — dense-parity moments (1.00x of dense Adam)
    rowwise_adam    — bf16 momentum + per-row fp32 second moment (~0.53x of
                      ONE table's memory; 0.26x of dense-Adam moments)
    rowwise_adagrad — one fp32 accumulator per row (~1/128 of dense moments)
    host_adam       — moments in host DRAM (embedding/host_offload.py):
                      ZERO device bytes for optimizer state

Writes benchmarks/memory_bench_results.json.
Usage: python benchmarks/memory_bench.py [--vocab 8000000] [--dim 64]
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def tree_bytes(tree) -> int:
    import jax

    return int(sum(x.nbytes for x in jax.tree.leaves(tree)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab", type=int, default=8_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(__file__), "memory_bench_results.json"),
    )
    args = ap.parse_args()
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from tpurec.config import (
        EmbeddingConfig,
        ExperimentConfig,
        ModelConfig,
        OptimizerConfig,
        TrainConfig,
    )
    from tpurec.data.schema import DataInfo
    from tpurec.train import Trainer

    half = args.vocab // 2
    info = DataInfo.from_dims(["user_id", "item_id"], [half, args.vocab - half])
    rng = np.random.default_rng(0)

    def batch(seed):
        r = np.random.default_rng(seed)
        b = {
            n: r.integers(off, off + dim, size=(args.batch,))
            for n, off, dim in zip(
                info.feature_names, info.feature_offsets, info.feature_dims
            )
        }
        b["label"] = r.integers(0, 2, args.batch).astype(np.float32)
        return b

    results = {
        "vocab": args.vocab,
        "dim": args.dim,
        "platform": args.platform,
        "optimizers": {},
    }
    for opt_name in ("rowwise_adam", "rowwise_adagrad", "adam", "host_adam"):
        cfg = ExperimentConfig(
            model=ModelConfig(name="fm", embedding=EmbeddingConfig(dim=args.dim)),
            train=TrainConfig(
                batch_size=args.batch,
                loss="bce",
                log_every_steps=0,
                sparse_embedding=True,
                optimizer=OptimizerConfig(
                    learning_rate=1e-3, embedding_optimizer=opt_name
                ),
            ),
        )
        trainer = Trainer(cfg, info)
        state = trainer.init_state(batch(0))
        mstate = trainer.metrics.init()
        t0 = time.time()
        loss = None
        for s in range(args.steps):
            state, mstate, logs = trainer.train_step(
                state, trainer.device_batch(batch(s)), mstate
            )
            loss = float(logs["loss"])
        dt = (time.time() - t0) / args.steps
        tables = tree_bytes(state.tables)
        opt_bytes = tree_bytes(state.table_opt)
        dense_adam_bytes = 2 * tables  # two fp32 moments per fp32 table elem
        results["optimizers"][opt_name] = {
            "table_bytes": tables,
            "optimizer_state_bytes": opt_bytes,
            "vs_dense_adam_moments": round(opt_bytes / dense_adam_bytes, 4),
            "vs_one_table": round(opt_bytes / tables, 4),
            "steps": args.steps,
            "sec_per_step": round(dt, 3),
            "final_loss": loss,
            "peak_rss_gb": round(
                resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2
            ),
        }
        if opt_name == "host_adam":
            # device optimizer bytes are just the per-table slot scalars;
            # the moments live in host DRAM (embedding/host_offload.py)
            results["optimizers"][opt_name]["host_moment_bytes"] = (
                trainer.host_store.nbytes()
            )
        del trainer, state, mstate
        print(json.dumps({opt_name: results["optimizers"][opt_name]}), flush=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
