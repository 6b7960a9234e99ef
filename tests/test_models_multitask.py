import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurec.config import (
    EmbeddingConfig,
    ExperimentConfig,
    ModelConfig,
    OptimizerConfig,
    TrainConfig,
)
from tpurec.data.generators import ImpressionLogGenerator
from tpurec.data.loader import ArrayLoader, load_columnar, shard_paths
from tpurec.data.schema import DataInfo
from tpurec.data.synthetic import make_impression_log_raw
from tpurec.models import build_model
from tpurec.train import Trainer

INFO = DataInfo.from_dims(
    [f"cat_{i}" for i in range(4)], [10, 12, 8, 9],
    continuous_names=["c0"], label_names=["ctr", "cvr"],
)

MT_MODELS = ["mmoe", "esmm", "ple", "esm2", "escm2", "fdn"]


def make_batch(batch=8, seed=0, with_labels=True):
    rng = np.random.default_rng(seed)
    inputs = {
        n: jnp.asarray(rng.integers(off, off + dim, size=(batch,)))
        for n, off, dim in zip(INFO.feature_names, INFO.feature_offsets, INFO.feature_dims)
    }
    inputs["c0"] = jnp.asarray(rng.random(batch, dtype=np.float32))
    if with_labels:
        ctr = rng.integers(0, 2, batch)
        inputs["ctr"] = jnp.asarray(ctr.astype(np.float32))
        inputs["cvr"] = jnp.asarray((ctr * rng.integers(0, 2, batch)).astype(np.float32))
    return inputs


@pytest.mark.parametrize("name", MT_MODELS)
def test_forward_contract(name):
    model = build_model(ModelConfig(name=name), INFO)
    inputs = make_batch()
    variables = model.init(jax.random.key(0), inputs)
    out = model.apply(variables, inputs)
    assert "ctr_output" in out
    p = np.asarray(out["ctr_output"])
    assert p.shape == (8,)
    assert np.all((p >= 0) & (p <= 1)) and np.all(np.isfinite(p))
    if name in ("esm2", "escm2", "fdn"):
        assert "loss" in out and np.isfinite(float(out["loss"]))
    if name in ("esmm", "esm2", "escm2"):
        assert "ctcvr_output" in out


def test_esmm_ctcvr_is_product():
    model = build_model(ModelConfig(name="esmm"), INFO)
    inputs = make_batch()
    v = model.init(jax.random.key(0), inputs)
    out = model.apply(v, inputs)
    np.testing.assert_allclose(
        np.asarray(out["ctcvr_output"]),
        np.asarray(out["ctr_output"]) * np.asarray(out["cvr_output"]),
        rtol=1e-6,
    )


@pytest.mark.parametrize("mode", ["ips", "dr"])
def test_escm2_counterfactual_modes(mode):
    model = build_model(ModelConfig(name="escm2", params={"counterfact_mode": mode}), INFO)
    inputs = make_batch()
    v = model.init(jax.random.key(0), inputs)
    out, grads = jax.value_and_grad(
        lambda p: model.apply({"params": p}, inputs)["loss"]
    )(v["params"]), None
    assert np.isfinite(float(out[0] if isinstance(out, tuple) else out))


def test_escm2_propensity_gradient_stopped():
    """IPS weighting must not backprop through the propensity (ctr) path from
    the CVR term — check the loss gradient exists and is finite either way."""
    model = build_model(ModelConfig(name="escm2"), INFO)
    inputs = make_batch()
    v = model.init(jax.random.key(0), inputs)
    g = jax.grad(lambda p: model.apply({"params": p}, inputs)["loss"])(v["params"])
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree.leaves(g))


def test_fdn_orth_loss_positive():
    model = build_model(ModelConfig(name="fdn"), INFO)
    inputs = make_batch()
    v = model.init(jax.random.key(0), inputs)
    out = model.apply(v, inputs)
    assert float(out["orth_loss_value"]) >= 0


def test_mmoe_end_to_end_on_impression_logs(tmp_path):
    """Full ch.4 pipeline: JSON impression log → generator → trainer; both
    AUCs must beat random (reference baseline: ctr 0.98 / cvr 0.96 on its own
    data — here a quick 2-epoch smoke at reduced scale)."""
    log = make_impression_log_raw(str(tmp_path / "raw"), n_events=20_000, seed=0)
    gen = ImpressionLogGenerator(str(tmp_path / "gen"), log)
    info = gen.run_all()
    train = load_columnar(shard_paths(str(tmp_path / "gen"), "train"))
    test = load_columnar(shard_paths(str(tmp_path / "gen"), "test"))
    cfg = ExperimentConfig(
        model=ModelConfig(name="mmoe", embedding=EmbeddingConfig(dim=8)),
        train=TrainConfig(
            batch_size=256, epochs=2, log_every_steps=0, loss="multi_task",
            compute_dtype="float32", optimizer=OptimizerConfig(learning_rate=0.01),
        ),
    )
    trainer = Trainer(cfg, info)
    state, report = trainer.run(
        lambda: iter(ArrayLoader(train, 256, seed=1)),
        lambda: iter(ArrayLoader(test, 256, shuffle=False)),
    )
    assert report["best_eval"]["ctr_auc"] > 0.8
    assert report["best_eval"]["cvr_auc"] > 0.8


def test_escm2_trains_with_model_loss():
    model_cfg = ModelConfig(name="escm2", embedding=EmbeddingConfig(dim=8))
    cfg = ExperimentConfig(
        model=model_cfg,
        train=TrainConfig(
            batch_size=64, epochs=1, log_every_steps=0, loss="model_loss",
            metrics=("ctr_auc", "cvr_auc"), compute_dtype="float32",
        ),
    )
    trainer = Trainer(cfg, INFO)
    rng = np.random.default_rng(0)
    n = 512
    data = {
        k: np.asarray(v)
        for k, v in make_batch(batch=n, seed=3).items()
    }
    loader = ArrayLoader(data, 64, seed=0)
    state, report = trainer.run(lambda: iter(loader), lambda: iter(loader))
    assert np.isfinite(report["best_eval"]["loss"])
    assert "ctr_auc" in report["best_eval"]
