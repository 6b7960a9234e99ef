"""Multi-series behavior sequences, end to end.

The reference carries several parallel behavior feature series per event
(5.DIN/ModelManager.py:13-20; 6.MIND/CustomLayers.py:199-240 concat-embeds
them). These tests check (a) the generator emits parallel series with aligned
query features, and (b) every sequence-model family consumes ≥2 series:
forward shape contract + a finite training gradient.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurec.config import EmbeddingConfig, ModelConfig
from tpurec.data.schema import DataInfo
from tpurec.models import build_model

# two parallel series: item-id history + item-tag history, each aligned with
# a candidate-side feature (item_id / item_tag)
INFO = DataInfo(
    feature_names=["item_id", "user_tag", "item_tag"],
    feature_dims=[100, 10, 12],
    feature_offsets=[1, 101, 111],
    total_dims=123,
    sequence_names=["history", "history_tags"],
    sequence_query_features=["item_id", "item_tag"],
    max_seq_length=16,
    padding_index=0,
    user_features=["user_tag"],
    item_features=["item_id", "item_tag"],
)

RETRIEVAL = ["mind", "sdm", "comirec", "sine"]
RANKING = ["din", "dien", "dsin", "dmr"]
TWO_STAGE = ["sim", "can", "eta", "sdim"]


def make_batch(batch=6, seed=0, L=16):
    rng = np.random.default_rng(seed)
    lengths = rng.integers(2, L + 1, size=(batch,))
    step_mask = np.arange(L)[None, :] < lengths[:, None]
    hist = np.where(step_mask, rng.integers(1, 101, size=(batch, L)), 0)
    hist_tags = np.where(step_mask, rng.integers(111, 123, size=(batch, L)), 0)
    return {
        "item_id": jnp.asarray(rng.integers(1, 101, size=(batch,))),
        "user_tag": jnp.asarray(rng.integers(101, 111, size=(batch,))),
        "item_tag": jnp.asarray(rng.integers(111, 123, size=(batch,))),
        "history": jnp.asarray(hist),
        "history_tags": jnp.asarray(hist_tags),
        "label": jnp.asarray(rng.integers(0, 2, size=(batch,)).astype(np.float32)),
    }


def _init_and_apply(name, dim=8, **params):
    model = build_model(
        ModelConfig(name=name, params=params, embedding=EmbeddingConfig(dim=dim)), INFO
    )
    inputs = make_batch()
    variables = model.init(jax.random.key(0), inputs)
    out = model.apply(
        variables,
        inputs,
        train=True,
        rngs={"dropout": jax.random.key(1), "sampling": jax.random.key(2)},
    )
    return model, variables, inputs, out


def _grad_norm(model, variables, inputs, out_key):
    def loss_fn(params):
        out = model.apply(
            {**variables, "params": params},
            inputs,
            train=True,
            rngs={"dropout": jax.random.key(1), "sampling": jax.random.key(2)},
        )
        val = out[out_key]
        return jnp.sum(jnp.square(val.astype(jnp.float32)))

    grads = jax.grad(loss_fn)(variables["params"])
    return sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))


@pytest.mark.parametrize("name", RETRIEVAL)
def test_retrieval_two_series(name):
    model, variables, inputs, out = _init_and_apply(name)
    # user/item vectors live in the concat F·D space (2 series × dim 8)
    assert out["user_embedding"].shape == (6, 16)
    assert out["item_embedding"].shape == (6, 16)
    assert np.all(np.isfinite(np.asarray(out["user_embedding"])))
    assert _grad_norm(model, variables, inputs, "user_embedding") > 0


@pytest.mark.parametrize("name", RANKING)
def test_ranking_two_series(name):
    params = {"num_sessions": 4} if name == "dsin" else {}
    model, variables, inputs, out = _init_and_apply(name, **params)
    assert out["output"].shape == (6,)
    assert np.all(np.isfinite(np.asarray(out["output"])))
    key = "logit" if "logit" in out else "output"
    assert _grad_norm(model, variables, inputs, key) > 0


@pytest.mark.parametrize("name", TWO_STAGE)
def test_two_stage_two_series(name):
    model, variables, inputs, out = _init_and_apply(name)
    assert out["gsu_logits"].shape == (6, 2)
    assert out["esu_logits"].shape == (6, 2)
    assert np.all(np.isfinite(np.asarray(out["esu_logits"])))
    assert _grad_norm(model, variables, inputs, "esu_logits") > 0


def test_comirec_sampled_negatives_two_series():
    model, variables, inputs, out = _init_and_apply(
        "comirec", num_sampled_negatives=5
    )
    assert out["logits"].shape == (6, 6)  # 1 positive + 5 negatives


def test_dmt_two_series():
    model, variables, inputs, out = _init_and_apply("dmt")
    assert out["ctr_output"].shape == (6,)
    assert np.all(np.isfinite(np.asarray(out["ctr_output"])))


def test_generator_emits_parallel_series(tmp_path):
    from tpurec.data.generators import SequenceDataGenerator
    from tpurec.data.loader import load_columnar, shard_paths
    from tpurec.data.synthetic import make_behavior_sequence_raw

    raw = make_behavior_sequence_raw(
        str(tmp_path / "raw"), n_users=40, n_items=30, n_events=300, max_history=10
    )
    # raw log carries aligned parallel lists
    rec = json.loads(open(raw["events_path"]).readline())
    assert len(rec["history"]) == len(rec["history_tags"])
    gen = SequenceDataGenerator(
        str(tmp_path / "gen"), raw["events_path"], max_seq_length=10
    )
    info = gen.run_all()
    assert info.sequence_names == ["history", "history_tags"]
    assert info.sequence_query_features == ["item_id", "item_tag"]
    data = load_columnar(shard_paths(str(tmp_path / "gen"), "train"))
    assert data["history"].shape == data["history_tags"].shape
    # both series pad together, and each encodes into its own feature block
    assert np.array_equal(data["history"] == 0, data["history_tags"] == 0)
    it_off = info.offset_of("item_tag")
    real = data["history_tags"][data["history_tags"] > 0]
    assert real.min() >= it_off
    assert real.max() < it_off + info.dim_of("item_tag")
    # schema round-trips through save/load
    loaded = DataInfo.load(str(tmp_path / "gen"))
    assert loaded.sequence_query_features == ["item_id", "item_tag"]


def test_train_e2e_two_series(tmp_path):
    """DIN + MIND train end-to-end on generated two-series data."""
    from tpurec.config import (
        EmbeddingConfig,
        ExperimentConfig,
        ModelConfig,
        OptimizerConfig,
        TrainConfig,
    )
    from tpurec.data.generators import SequenceDataGenerator
    from tpurec.data.loader import ArrayLoader, load_columnar, shard_paths
    from tpurec.data.synthetic import make_behavior_sequence_raw
    from tpurec.train import Trainer

    raw = make_behavior_sequence_raw(
        str(tmp_path / "raw"), n_users=60, n_items=40, n_events=600, max_history=8
    )
    info = SequenceDataGenerator(
        str(tmp_path / "gen"), raw["events_path"], max_seq_length=8
    ).run_all()
    train = load_columnar(shard_paths(str(tmp_path / "gen"), "train"))
    for name, loss in (("din", "bce"), ("mind", "in_batch_softmax")):
        cfg = ExperimentConfig(
            model=ModelConfig(name=name, embedding=EmbeddingConfig(dim=4)),
            train=TrainConfig(
                batch_size=64, epochs=1, log_every_steps=0, loss=loss,
                optimizer=OptimizerConfig(learning_rate=0.01),
            ),
        )
        trainer = Trainer(cfg, info)
        state = trainer.init_state(next(iter(ArrayLoader(train, 64))))
        s2, results = trainer.train_epoch(state, iter(ArrayLoader(train, 64, seed=0)))
        assert np.isfinite(results["loss"])
