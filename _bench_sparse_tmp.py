import time, numpy as np, jax, jax.numpy as jnp
from tpurec.config import *
from tpurec.data.schema import DataInfo
from tpurec.train import Trainer
F, CARD, B = 20, 400_000, 8192
INFO = DataInfo.from_dims([f"f{i}" for i in range(F)], [CARD]*F)
rng = np.random.default_rng(0)
batch = {f"f{i}": rng.integers(i*CARD, (i+1)*CARD, B) for i in range(F)}
batch["label"] = rng.integers(0, 2, B).astype(np.float32)
for sparse in (True, False):
    cfg = ExperimentConfig(model=ModelConfig(name="deepfm", embedding=EmbeddingConfig(dim=64)),
        train=TrainConfig(batch_size=B, compute_dtype="bfloat16", sparse_embedding=sparse))
    tr = Trainer(cfg, INFO)
    state = tr.init_state(batch); ms = tr.metrics.init(); db = tr.device_batch(batch)
    for _ in range(8): state, ms, logs = tr.train_step(state, db, ms)
    leaves = [x for x in jax.tree.leaves(state.tables if sparse else state.params) if getattr(x, "ndim", 0) == 2]
    _ = float(jnp.sum(leaves[0][0]))
    t0=time.perf_counter(); n=20
    for _ in range(n): state, ms, logs = tr.train_step(state, db, ms)
    leaves = [x for x in jax.tree.leaves(state.tables if sparse else state.params) if getattr(x, "ndim", 0) == 2]
    checksum = float(sum(float(jnp.sum(x[0])) for x in leaves))
    dt=(time.perf_counter()-t0)/n
    print(f"V=8M sparse={sparse}: {dt*1e3:.2f} ms/step ({B/dt:,.0f} ex/s)", flush=True)
