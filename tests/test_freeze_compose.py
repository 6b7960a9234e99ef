"""Pretrain→freeze trunk composition (reference: SIM/CAN load a FROZEN
pretrained DIEN as their trunk, 7.SIM/CustomLayers.py:155-157, 404-406).

Flow under test: pretrain standalone DIEN → export → build SIM with
use_dien_trunk=True → graft the export under params['trunk'] →
train with freeze_prefixes=('trunk',) → the trunk is byte-identical after
training while other params moved.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

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

INFO = DataInfo(
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


def make_data(n=256, L=8, seed=0):
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


def _cfg(name, loss, dim=4, **train_kw):
    params = train_kw.pop("model_params", {})
    return ExperimentConfig(
        model=ModelConfig(name=name, params=params, embedding=EmbeddingConfig(dim=dim)),
        train=TrainConfig(
            batch_size=64, epochs=1, log_every_steps=0, loss=loss,
            compute_dtype="float32",
            optimizer=OptimizerConfig(learning_rate=0.05), **train_kw,
        ),
    )


def test_sim_frozen_dien_trunk(tmp_path):
    data = make_data()
    # 1) pretrain a standalone DIEN and export it
    dien_trainer = Trainer(_cfg("dien", "bce"), INFO)
    state = dien_trainer.init_state(next(iter(ArrayLoader(data, 64))))
    state, _ = dien_trainer.train_epoch(state, iter(ArrayLoader(data, 64, seed=1)))
    export_dir = str(tmp_path / "dien_export")
    dien_trainer.export(state, export_dir)
    dien_params = jax.device_get(state.params)

    # 2) SIM with a DIEN trunk, seeded from the export and frozen
    sim_trainer = Trainer(
        _cfg(
            "sim", "gsu_esu",
            model_params={"use_dien_trunk": True},
            freeze_prefixes=("trunk",),
        ),
        INFO,
    )
    sim_state = sim_trainer.init_state(next(iter(ArrayLoader(data, 64))))
    sim_state = sim_trainer.init_subtree_from_export(sim_state, export_dir, "trunk")
    # grafted values == pretrained values
    by_key = lambda entries: sorted(entries, key=lambda e: jax.tree_util.keystr(e[0]))
    for (pa, a), (pb, b) in zip(
        by_key(jax.tree_util.tree_flatten_with_path(dien_params)[0]),
        by_key(jax.tree_util.tree_flatten_with_path(jax.device_get(sim_state.params["trunk"]))[0]),
    ):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    trunk_before = jax.device_get(sim_state.params["trunk"])
    others_before = jax.device_get(
        {k: v for k, v in sim_state.params.items() if k != "trunk"}
    )
    # 3) train — trunk must not move, the rest must
    sim_state, results = sim_trainer.train_epoch(
        sim_state, iter(ArrayLoader(data, 64, seed=2))
    )
    assert np.isfinite(results["loss"])
    trunk_after = jax.device_get(sim_state.params["trunk"])
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(trunk_before)[0],
        jax.tree_util.tree_flatten_with_path(trunk_after)[0],
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=f"frozen leaf moved: {pa}"
        )
    moved = 0
    for (_, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(others_before)[0],
        jax.tree_util.tree_flatten_with_path(
            jax.device_get({k: v for k, v in sim_state.params.items() if k != "trunk"})
        )[0],
    ):
        moved += int(not np.array_equal(np.asarray(a), np.asarray(b)))
    assert moved > 0, "non-trunk params did not train"


def test_can_dien_trunk_forward():
    """CAN with the composed DIEN trunk runs forward/backward."""
    from tpurec.models import build_model

    model = build_model(
        ModelConfig(
            name="can",
            params={"use_dien_trunk": True},
            embedding=EmbeddingConfig(dim=4),
        ),
        INFO,
    )
    batch = {k: jnp.asarray(v) for k, v in make_data(16).items()}
    variables = model.init(jax.random.key(0), batch)
    out = model.apply(variables, batch, train=True, rngs={"dropout": jax.random.key(1)})
    assert "trunk" in variables["params"]
    assert np.all(np.isfinite(np.asarray(out["esu_logits"])))


def test_freeze_prefix_matches_whole_segments():
    """'trunk' must freeze trunk/... but NOT a sibling named 'trunk_rnn'."""
    cfg = _cfg("can", "gsu_esu", freeze_prefixes=("trunk",))
    trainer = Trainer(cfg, INFO)  # default CAN has a 'trunk_rnn' GRU
    data = make_data(64)
    state = trainer.init_state(next(iter(ArrayLoader(data, 64))))
    before = jax.device_get(state.params)
    state, _ = trainer.train_epoch(state, iter(ArrayLoader(data, 64, seed=1)))
    after = jax.device_get(state.params)
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(before["trunk_rnn"]), jax.tree.leaves(after["trunk_rnn"])
        )
    )
    assert changed, "'trunk' prefix wrongly froze sibling 'trunk_rnn'"
