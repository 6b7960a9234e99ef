"""Worker for tests/test_multiprocess.py: one of N localhost CPU processes
running the sharded FM train step through jax.distributed (the multi-host
path of SURVEY §2.10's communication backend — control plane via the jax
coordinator, data plane via XLA collectives).

Invoked as: python multiprocess_worker.py <pid> <nproc> <port> <out.json>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nproc, port, out_path = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    from tpurec.core import distributed

    topo = distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, topo

    import numpy as np

    from tpurec.config import (
        EmbeddingConfig,
        ExperimentConfig,
        ModelConfig,
        OptimizerConfig,
        TrainConfig,
    )
    from tpurec.data.loader import ArrayLoader
    from tpurec.data.schema import DataInfo
    from tpurec.train import Trainer

    info = DataInfo.from_dims(["ua", "ub", "ia", "ib"], [40, 30, 50, 20])
    rng = np.random.default_rng(0)  # identical data on every process
    n = 1024
    data = {
        name: rng.integers(off, off + dim, size=(n,))
        for name, off, dim in zip(
            info.feature_names, info.feature_offsets, info.feature_dims
        )
    }
    data["label"] = rng.integers(0, 2, n).astype(np.float32)

    cfg = ExperimentConfig(
        model=ModelConfig(name="fm", embedding=EmbeddingConfig(dim=8)),
        train=TrainConfig(
            batch_size=256,
            loss="bce",
            log_every_steps=0,
            compute_dtype="float32",
            optimizer=OptimizerConfig(learning_rate=1e-2),
        ),
    )
    trainer = Trainer(cfg, info)
    assert trainer.mesh_ctx.n_devices == 4 * nproc, trainer.mesh_ctx
    # per-host shard of rows; global batch per step == rows [k*256, (k+1)*256)
    loader = ArrayLoader(
        data, 256 // nproc, shuffle=False, **distributed.host_loader_kwargs()
    )
    it = iter(loader)
    first = next(iter(ArrayLoader(data, 256, shuffle=False)))  # full-batch init
    state = trainer.init_state(first)
    mstate = trainer.metrics.init()
    losses = []
    for _ in range(3):
        batch = trainer.device_batch(next(it))
        state, mstate, logs = trainer.train_step(state, batch, mstate)
        losses.append(float(logs["loss"]))
    results = {k: float(v) for k, v in trainer.metrics.result(mstate).items()}
    # embedding-table checksum: must be identical across processes AND match
    # the single-process run (params are replicated on the (8,1) mesh)
    v_sum = float(jax.numpy.sum(jax.numpy.abs(state.params["v"]["embedding"])))
    if pid == 0:
        with open(out_path, "w") as f:
            json.dump(
                {"losses": losses, "metrics": results, "v_sum": v_sum, "topo": topo}, f
            )
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
