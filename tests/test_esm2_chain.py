"""ESM2 full 8-node probability graph + FDN per-expert decomposition
(reference 9.ESCM2/CustomLayers.py:438-601, 707-862)."""

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
from tpurec.data.schema import DataInfo
from tpurec.models import build_model

INFO = DataInfo.from_dims(
    ["cat_0", "cat_1", "cat_2"], [20, 20, 20], continuous_names=["c0"],
    label_names=["click", "cart", "collect", "none", "order", "pay", "ctr", "cvr"],
)


def make_batch(batch=16, seed=0):
    rng = np.random.default_rng(seed)
    inputs = {
        n: jnp.asarray(rng.integers(off, off + dim, size=(batch,)))
        for n, off, dim in zip(INFO.feature_names, INFO.feature_offsets, INFO.feature_dims)
    }
    inputs["c0"] = jnp.asarray(rng.random(batch, dtype=np.float32))
    click = rng.integers(0, 2, batch)
    cart = click * rng.integers(0, 2, batch)
    collect = click * (1 - cart) * rng.integers(0, 2, batch)
    none = click * (1 - cart) * (1 - collect)
    order = (cart | collect | none) * rng.integers(0, 2, batch)
    pay = order * rng.integers(0, 2, batch)
    for k, v in [("click", click), ("cart", cart), ("collect", collect),
                 ("none", none), ("order", order), ("pay", pay)]:
        inputs[k] = jnp.asarray(v.astype(np.float32))
    inputs["ctr"] = inputs["click"]
    inputs["cvr"] = inputs["pay"]
    return inputs


def test_esm2_chain_identities():
    """Probability-graph consistency: every node prob in [0,1]; branch probs
    partition below click; order below branch total; pay below order."""
    model = build_model(ModelConfig(name="esm2"), INFO)
    inputs = make_batch()
    v = model.init(jax.random.key(0), inputs)
    out = model.apply(v, inputs)
    click = np.asarray(out["ctr_output"])
    cart = np.asarray(out["cart_output"])
    collect = np.asarray(out["collect_output"])
    none = np.asarray(out["none_output"])
    order = np.asarray(out["order_output"])
    pay = np.asarray(out["ctcvr_output"])
    for p in (click, cart, collect, none, order, pay):
        assert np.all((p >= 0) & (p <= 1))
    assert np.all(cart + collect + none <= click + 1e-5)
    assert np.all(order <= cart + collect + none + 1e-5)
    assert np.all(pay <= order + 1e-5)
    assert np.isfinite(float(out["loss"]))


def test_esm2_all_six_edges_supervised():
    """With full chain labels every edge's task gets gradient."""
    model = build_model(ModelConfig(name="esm2"), INFO)
    inputs = make_batch()
    v = model.init(jax.random.key(0), inputs)

    grads = jax.grad(lambda p: model.apply({"params": p}, inputs)["loss"])(v["params"])
    for task in (
        "click", "cart_given_click", "collect_given_no_cart",
        "none_given_no_action", "order_given_cart", "order_given_collect",
        "order_given_none", "pay_given_order",
    ):
        g = sum(
            float(jnp.sum(jnp.abs(x)))
            for k, sub in grads.items()
            if k.startswith(task)
            for x in jax.tree.leaves(sub)
        )
        assert g > 0, f"task {task} got no gradient"


def test_esm2_legacy_two_label_fallback():
    """ctr/cvr-only batches still produce a finite loss (click + pay edges)."""
    model = build_model(ModelConfig(name="esm2"), INFO)
    inputs = make_batch()
    for k in ("click", "cart", "collect", "none", "order", "pay"):
        del inputs[k]
    v = model.init(jax.random.key(0), inputs)
    out = model.apply(v, inputs)
    assert np.isfinite(float(out["loss"]))


def test_esm2_loss_weights_scale_edges():
    model_w = build_model(
        ModelConfig(name="esm2", params={"loss_weights": (2.0, 0, 0, 0, 0, 0)}), INFO
    )
    model_1 = build_model(
        ModelConfig(name="esm2", params={"loss_weights": (1.0, 0, 0, 0, 0, 0)}), INFO
    )
    inputs = make_batch()
    v = model_1.init(jax.random.key(0), inputs)
    l1 = float(model_1.apply(v, inputs)["loss"])
    l2 = float(model_w.apply(v, inputs)["loss"])
    np.testing.assert_allclose(l2, 2 * l1, rtol=1e-6)


def test_full_chain_pipeline_trains(tmp_path):
    """make_impression_log_raw(full_chain) → ImpressionLogGenerator → ESM2
    trains; AUC over the purchase (pay) label beats random."""
    from tpurec.data.generators import ImpressionLogGenerator
    from tpurec.data.loader import ArrayLoader, load_columnar, shard_paths
    from tpurec.data.synthetic import make_impression_log_raw
    from tpurec.train import Trainer

    log = make_impression_log_raw(
        str(tmp_path / "raw"), n_events=8000, full_chain=True, seed=1
    )
    info = ImpressionLogGenerator(str(tmp_path / "gen"), log).run_all()
    assert set(info.label_names) >= {"click", "cart", "collect", "none", "order", "pay"}
    train = load_columnar(shard_paths(str(tmp_path / "gen"), "train"))
    test = load_columnar(shard_paths(str(tmp_path / "gen"), "test"))
    # chain sanity in the generated data
    assert np.all(train["cart"] <= train["click"])
    assert np.all(train["pay"] <= train["order"])
    assert np.all(train["cart"] + train["collect"] + train["none"] == train["click"])
    cfg = ExperimentConfig(
        model=ModelConfig(name="esm2", embedding=EmbeddingConfig(dim=8)),
        train=TrainConfig(
            batch_size=256, epochs=3, log_every_steps=0, loss="model_loss",
            metrics=("ctr_auc", "cvr_auc"), compute_dtype="float32",
            optimizer=OptimizerConfig(learning_rate=0.01),
        ),
    )
    trainer = Trainer(cfg, info)
    state, report = trainer.run(
        lambda: iter(ArrayLoader(train, 256, seed=1)),
        lambda: iter(ArrayLoader(test, 256, shuffle=False)),
    )
    # cvr_auc is measured on the pay label against pCTCVR
    assert report["best_eval"]["ctr_auc"] > 0.8, report["best_eval"]
    assert report["best_eval"]["cvr_auc"] > 0.7, report["best_eval"]


def test_fdn_per_expert_pairing_and_aux():
    """FDN: shared experts = tasks × experts_per_task (pairing constraint);
    per-expert aux heads exist per (level, task); orthogonality responds to
    the raw expert outputs."""
    info = DataInfo.from_dims(["a", "b"], [10, 10], continuous_names=[])
    model = build_model(
        ModelConfig(name="fdn", params={"num_levels": 2, "experts_per_task": 2}), info
    )
    rng = np.random.default_rng(0)
    inputs = {
        "a": jnp.asarray(rng.integers(0, 10, 12)),
        "b": jnp.asarray(rng.integers(10, 20, 12)),
        "ctr": jnp.asarray(rng.integers(0, 2, 12).astype(np.float32)),
        "cvr": jnp.asarray(rng.integers(0, 2, 12).astype(np.float32)),
    }
    from flax import linen as nn

    v = model.init(jax.random.key(0), inputs)
    p = nn.unbox(v)["params"]  # strip TP Partitioned boxes
    # shared bank has T·E = 4 experts at each level
    assert p["L0_shared_experts"]["w_0"].shape[0] == 4
    # per-expert aux heads: (E, H) weight per (level, task)
    assert p["L0_ctr_aux_w"].shape[0] == 2
    assert p["L1_cvr_aux_w"].shape[0] == 2
    out = model.apply(v, inputs)
    assert np.isfinite(float(out["loss"]))
    assert float(out["orth_loss_value"]) >= 0
