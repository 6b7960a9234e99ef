import numpy as np, jax
from tpurec.config import *
from tpurec.data.schema import DataInfo
from tpurec.train import Trainer
from tpurec.embedding.modules import set_sparse_mode
set_sparse_mode(False)
F, CARD, B = 20, 100_000, 8192
INFO = DataInfo.from_dims([f"f{i}" for i in range(F)], [CARD]*F)
rng = np.random.default_rng(0)
batch = {f"f{i}": rng.integers(i*CARD, (i+1)*CARD, B) for i in range(F)}
batch["label"] = rng.integers(0, 2, B).astype(np.float32)
cfg = ExperimentConfig(model=ModelConfig(name="deepfm", embedding=EmbeddingConfig(dim=64)),
    train=TrainConfig(batch_size=B, compute_dtype="bfloat16", sparse_embedding=True))
tr = Trainer(cfg, INFO)
state = tr.init_state(batch); ms = tr.metrics.init(); db = tr.device_batch(batch)
state, ms, logs = tr.train_step(state, db, ms)
jax.block_until_ready(logs["loss"])
import shutil; shutil.rmtree("/tmp/sparse_trace2", ignore_errors=True)
jax.profiler.start_trace("/tmp/sparse_trace2")
for _ in range(3): state, ms, logs = tr.train_step(state, db, ms)
jax.block_until_ready(logs["loss"])
jax.profiler.stop_trace()
print("done")
