"""Tensor parallelism over the 'model' mesh axis (SURVEY §2.10 TP row).

Checks that dense/expert/attention weights actually CARRY 'model'
partitioning (nn.get_partition_spec), that the compiled sharded train step
contains cross-device collectives, and that a TP-sharded run is numerically
equivalent to a pure-DP run."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn
from jax.sharding import PartitionSpec as P

from tpurec.config import (
    EmbeddingConfig,
    ExperimentConfig,
    MeshConfig,
    ModelConfig,
    OptimizerConfig,
    TrainConfig,
)
from tpurec.core.mesh import make_mesh
from tpurec.data.loader import ArrayLoader
from tpurec.data.schema import DataInfo
from tpurec.models import build_model
from tpurec.train import Trainer

MT_INFO = DataInfo.from_dims(
    ["a", "b", "c"], [40, 40, 40], label_names=["ctr", "cvr"]
)

SEQ_INFO = DataInfo(
    feature_names=["item_id", "user_tag", "item_tag"],
    feature_dims=[50, 8, 10],
    feature_offsets=[1, 51, 59],
    total_dims=69,
    sequence_names=["history", "history_tags"],
    sequence_query_features=["item_id", "item_tag"],
    max_seq_length=8,
    padding_index=0,
    user_features=["user_tag"],
    item_features=["item_id", "item_tag"],
)


def mt_batch(n=64, seed=0):
    rng = np.random.default_rng(seed)
    b = {
        name: rng.integers(off, off + dim, size=(n,))
        for name, off, dim in zip(
            MT_INFO.feature_names, MT_INFO.feature_offsets, MT_INFO.feature_dims
        )
    }
    ctr = rng.integers(0, 2, n)
    b["ctr"] = ctr.astype(np.float32)
    b["cvr"] = (ctr * rng.integers(0, 2, n)).astype(np.float32)
    return b


def seq_batch(n=64, L=8, seed=0):
    rng = np.random.default_rng(seed)
    lengths = rng.integers(2, L + 1, size=(n,))
    step = np.arange(L)[None, :] < lengths[:, None]
    return {
        "item_id": rng.integers(1, 51, size=(n,)),
        "user_tag": rng.integers(51, 59, size=(n,)),
        "item_tag": rng.integers(59, 69, size=(n,)),
        "history": np.where(step, rng.integers(1, 51, size=(n, L)), 0),
        "history_tags": np.where(step, rng.integers(59, 69, size=(n, L)), 0),
        "label": rng.integers(0, 2, size=(n,)).astype(np.float32),
    }


def test_expert_bank_carries_model_specs():
    model = build_model(ModelConfig(name="mmoe", embedding=EmbeddingConfig(dim=8)), MT_INFO)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.key(0), {k: jnp.asarray(v) for k, v in mt_batch(8).items()})
    )
    specs = nn.get_partition_spec(variables)["params"]["experts"]
    assert specs["w_0"] == P(None, None, "model")
    assert specs["b_0"] == P(None, "model")
    assert specs["w_1"] == P(None, "model", None)  # row-sharded second layer


def test_mha_and_mlp_carry_model_specs():
    model = build_model(ModelConfig(name="dsin", params={"num_sessions": 4},
                                    embedding=EmbeddingConfig(dim=8)), SEQ_INFO)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.key(0), {k: jnp.asarray(v) for k, v in seq_batch(8).items()})
    )
    params = nn.get_partition_spec(variables)["params"]
    assert params["session_encoder"]["q"]["kernel"] == P(None, "model")
    assert params["session_encoder"]["out"]["kernel"] == P("model", None)
    assert params["mlp"]["dense_0"]["kernel"] == P(None, "model")
    assert params["mlp"]["dense_1"]["kernel"] == P("model", None)


def _run_steps(mesh_cfg, name, info, batch_fn, loss, steps=4):
    cfg = ExperimentConfig(
        model=ModelConfig(name=name, embedding=EmbeddingConfig(dim=8)),
        train=TrainConfig(
            batch_size=64, epochs=1, log_every_steps=0, loss=loss,
            compute_dtype="float32", seed=7,
            optimizer=OptimizerConfig(learning_rate=0.01),
        ),
        mesh=mesh_cfg,
    )
    trainer = Trainer(cfg, info)
    data = batch_fn(64 * steps, seed=3)
    state = trainer.init_state(batch_fn(64, seed=3))
    metric_state = trainer.metrics.init()
    losses = []
    for i in range(steps):
        batch = {k: v[i * 64 : (i + 1) * 64] for k, v in data.items()}
        state, metric_state, logs = trainer.train_step(
            state, trainer.device_batch(batch), metric_state
        )
        losses.append(float(logs["loss"]))
    return losses, state


@pytest.mark.parametrize(
    "name,info,batch_fn,loss",
    [
        ("mmoe", MT_INFO, mt_batch, "multi_task"),
        ("din", SEQ_INFO, seq_batch, "bce"),
    ],
)
def test_tp_matches_dp(name, info, batch_fn, loss):
    """(data=4, model=2) TP run reproduces the (8, 1) pure-DP run."""
    losses_dp, state_dp = _run_steps(MeshConfig(data=8, model=1), name, info, batch_fn, loss)
    losses_tp, state_tp = _run_steps(MeshConfig(data=4, model=2), name, info, batch_fn, loss)
    np.testing.assert_allclose(losses_dp, losses_tp, rtol=2e-4, atol=2e-5)
    # reduction order differs across shardings; agreement to ~1e-5 absolute
    # after 4 Adam steps is sharding-equivalence, not luck. Embedding tables
    # pad their vocab to a model-axis multiple (pad_vocab), so compare the
    # common (real) rows only.
    for a, b in zip(jax.tree.leaves(state_dp.params), jax.tree.leaves(state_tp.params)):
        a, b = np.asarray(a), np.asarray(b)
        n = min(a.shape[0], b.shape[0]) if a.ndim else None
        np.testing.assert_allclose(a[:n], b[:n], rtol=5e-3, atol=5e-5)


def test_expert_weights_actually_sharded_and_collectives_present():
    """On the (4, 2) mesh the expert kernels live sharded over 'model'
    (addressable shard smaller than the full array) and the compiled step
    program contains cross-replica collectives."""
    mesh_ctx = make_mesh(MeshConfig(data=4, model=2))
    cfg = ExperimentConfig(
        model=ModelConfig(name="mmoe", embedding=EmbeddingConfig(dim=8)),
        train=TrainConfig(batch_size=64, epochs=1, log_every_steps=0,
                          loss="multi_task", compute_dtype="float32",
                          optimizer=OptimizerConfig(learning_rate=0.01)),
        mesh=MeshConfig(data=4, model=2),
    )
    trainer = Trainer(cfg, MT_INFO, mesh_ctx=mesh_ctx)
    state = trainer.init_state(mt_batch(64))
    w0 = state.params["experts"]["w_0"]
    shard = w0.addressable_shards[0].data
    assert shard.shape[-1] * 2 == w0.shape[-1], (shard.shape, w0.shape)
    # compiled HLO of the train step contains collectives over the mesh
    batch = trainer.device_batch(mt_batch(64))
    metric_state = trainer.metrics.init()
    lowered = jax.jit(trainer.train_step.__wrapped__).lower(state, batch, metric_state)
    txt = lowered.compile().as_text()
    assert re.search(r"all-reduce|all-gather|reduce-scatter|collective", txt), (
        "no collectives in compiled train step"
    )
