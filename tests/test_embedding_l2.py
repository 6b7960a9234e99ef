"""Full-table / per-order / per-feature coupled embedding L2 (the Keras
embeddings_regularizer='l2' family — reference FM regularization,
2.FM/CustomLayers.py:129-134 — plus the per-order and per-feature splits the
weak-signal parity recipe uses)."""

import numpy as np
import pytest

from tpurec.config import (
    EmbeddingConfig,
    ExperimentConfig,
    ModelConfig,
    OptimizerConfig,
    TrainConfig,
)
from tpurec.data.schema import DataInfo
from tpurec.train import Trainer

INFO = DataInfo.from_dims(["uid", "tag"], [50, 10])


def _run(opt_kwargs, steps=6):
    cfg = ExperimentConfig(
        model=ModelConfig(name="fm", embedding=EmbeddingConfig(dim=4)),
        train=TrainConfig(
            batch_size=32, loss="bce", log_every_steps=0, compute_dtype="float32",
            optimizer=OptimizerConfig(learning_rate=1e-2, **opt_kwargs),
        ),
    )
    tr = Trainer(cfg, INFO)
    rng = np.random.default_rng(0)
    b = {
        "uid": rng.integers(0, 50, 32),
        "tag": rng.integers(50, 60, 32),
        "label": rng.integers(0, 2, 32).astype(np.float32),
    }
    st = tr.init_state(b)
    ms = tr.metrics.init()
    v0 = np.abs(np.array(st.params["v"]["embedding"]))
    w0 = np.abs(np.array(st.params["w"]["w"]["embedding"]))
    for _ in range(steps):
        st, ms, _ = tr.train_step(st, tr.device_batch(b), ms)
    v1 = np.abs(np.array(st.params["v"]["embedding"]))
    w1 = np.abs(np.array(st.params["w"]["w"]["embedding"]))
    return v0, v1, w0, w1


def _shrink(a0, a1, rows=slice(None)):
    return 1.0 - a1[rows].mean() / a0[rows].mean()


def test_full_table_decay_hits_untouched_rows():
    # ids 40..49 never appear in the batch but must still decay
    v0, v1, _, _ = _run({"embedding_l2": 0.1})
    rng = np.random.default_rng(0)
    used = set(np.concatenate([rng.integers(0, 50, 32), rng.integers(50, 60, 32)]))
    untouched = [i for i in range(60) if i not in used]
    assert _shrink(v0, v1, untouched) > 0.3


def test_per_order_split():
    # measure over REAL rows only: pad_vocab rows carry zero fit-gradients,
    # and Adam turns even the 1e-5 decay gradient there into full-lr steps
    # (scale-free), which would swamp the mean once padding grew to lane=128.
    # Intent of the split: λ=0.1 crushes the interaction table while the
    # order-1 table (λ=1e-5) is free to GROW toward the fit.
    v0, v1, w0, w1 = _run({"embedding_l2": 0.1, "embedding_l2_order1": 1e-5})
    real = slice(0, INFO.total_dims)
    assert _shrink(v0, v1, real) > 0.5  # order-2 strongly decayed
    assert _shrink(w0, w1, real) < 0.1  # order-1 not decayed (may grow)


def test_per_feature_overrides():
    v0, v1, _, _ = _run(
        {
            "embedding_l2": 1e-4,
            "embedding_l2_order1": 1e-5,
            "embedding_l2_overrides": {"uid": 0.2},
        }
    )
    uid_s = _shrink(v0, v1, slice(0, 50))
    tag_s = _shrink(v0, v1, slice(50, 60))
    assert uid_s > tag_s + 0.1
