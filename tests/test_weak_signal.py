"""Weak-signal (3.DCN-regime) dataset family: generator, pipeline round trip,
and trainability of the FM / AutoInt parity pair.

The reference's chapter-3 baselines (FM eval AUC 0.5879, AutoInt 0.5972 —
BASELINE.md) were measured on production impressions with features
uid/iid/utag1-4/itag1-4 + itag4 origin/square/cube
(3.DCN/ModelManager.py:14-15). make_dcn_raw plants that regime synthetically;
RankingTableGenerator is the pipeline for its flat-CSV schema.
"""

import os

import numpy as np
import pytest

from tpurec.config import (
    EmbeddingConfig,
    ExperimentConfig,
    ModelConfig,
    OptimizerConfig,
    TrainConfig,
)
from tpurec.data.generators import RankingTableGenerator
from tpurec.data.loader import ArrayLoader, load_columnar, shard_paths
from tpurec.data.synthetic import make_dcn_raw


@pytest.fixture(scope="module")
def weak_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("weak")
    raw = make_dcn_raw(
        str(root / "raw"),
        n_users=800,
        n_items=400,
        n_events=30_000,
        target_oracle_auc=0.62,
        seed=0,
    )
    gen = RankingTableGenerator(str(root / "gen"), raw["main_path"])
    info = gen.run_all()
    train = load_columnar(shard_paths(str(root / "gen"), "train"))
    test = load_columnar(shard_paths(str(root / "gen"), "test"))
    return raw, info, train, test


def test_generator_schema(weak_data):
    raw, info, train, test = weak_data
    assert info.feature_names == [
        "uid", "iid",
        "utag1", "utag2", "utag3", "utag4",
        "itag1", "itag2", "itag3", "itag4",
    ]
    assert info.continuous_names == ["itag4_origin", "itag4_square", "itag4_cube"]
    assert info.label_names == ["label"]
    # offset encoding: feature blocks are disjoint
    for name, off, dim in zip(info.feature_names, info.feature_offsets, info.feature_dims):
        col = np.concatenate([train[name], test[name]])
        assert col.min() >= off and col.max() < off + dim, name
    # derived continuous columns are exact powers
    v = train["itag4_origin"]
    np.testing.assert_allclose(train["itag4_square"], v * v, rtol=1e-5)
    np.testing.assert_allclose(train["itag4_cube"], v * v * v, rtol=1e-5)
    # timestamp split put ~20% in test
    frac = len(test["label"]) / (len(test["label"]) + len(train["label"]))
    assert 0.15 < frac < 0.25


def test_oracle_is_weak_signal(weak_data):
    raw, _, _, _ = weak_data
    orc = np.load(raw["oracle_path"])
    # the defining property of the family: oracle AUC in the 0.6 class, and
    # the categorical-only view strictly below the full oracle (the planted
    # continuous cubic is what separates AutoInt from FM)
    assert 0.57 < float(orc["oracle_auc"]) < 0.67
    assert float(orc["cat_only_auc"]) < float(orc["oracle_auc"])


@pytest.mark.parametrize("name,lr", [("fm", 0.01), ("autoint", 0.003)])
def test_models_learn_weak_signal(weak_data, name, lr):
    from tpurec.train import Trainer

    raw, info, train, test = weak_data
    cfg = ExperimentConfig(
        model=ModelConfig(name=name, embedding=EmbeddingConfig(dim=8)),
        train=TrainConfig(
            batch_size=512,
            epochs=2,
            log_every_steps=0,
            loss="bce",
            optimizer=OptimizerConfig(learning_rate=lr),
        ),
    )
    trainer = Trainer(cfg, info)
    state, report = trainer.run(
        lambda: iter(ArrayLoader(train, 512, seed=1)),
        lambda: iter(ArrayLoader(test, 512, shuffle=False)),
    )
    # above chance on held-out data, below the planted oracle
    orc = np.load(raw["oracle_path"])
    assert report["best_eval"]["auc"] > 0.53
    assert report["best_eval"]["auc"] < float(orc["oracle_auc"]) + 0.03
