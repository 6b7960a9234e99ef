import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurec.config import ModelConfig
from tpurec.data.schema import DataInfo
from tpurec.models import build_model
from tpurec.ops.interactions import fm_second_order

INFO = DataInfo.from_dims(
    ["user_tag1", "user_tag2", "item_tag1", "item_tag2", "item_tag3"],
    [5, 7, 11, 3, 4],
    user_features=["user_tag1", "user_tag2"],
    item_features=["item_tag1", "item_tag2", "item_tag3"],
    continuous_names=["price"],
)


def make_inputs(batch=6, seed=0):
    rng = np.random.default_rng(seed)
    inputs = {}
    for name, dim, off in zip(INFO.feature_names, INFO.feature_dims, INFO.feature_offsets):
        inputs[name] = jnp.asarray(rng.integers(off, off + dim, size=(batch,)))
    inputs["price"] = jnp.asarray(rng.random(batch, dtype=np.float32))
    inputs["user_id"] = inputs["user_tag1"]
    inputs["item_id"] = inputs["item_tag1"]
    return inputs


FM_FAMILY = [
    "matrixcf",
    "ncf",
    "fm",
    "dssm_single",
    "dssm_double",
    "deepfm",
    "wide_and_deep",
    "ffm",
    "fwfm",
    "pnn",
    "onn",
]


@pytest.mark.parametrize("name", FM_FAMILY)
def test_forward_output_contract(name):
    model = build_model(ModelConfig(name=name), INFO)
    inputs = make_inputs()
    variables = model.init(jax.random.key(0), inputs)
    out = model.apply(variables, inputs)
    assert "output" in out
    p = np.asarray(out["output"])
    assert p.shape == (6,)
    assert np.all(p >= 0.0) and np.all(p <= 1.0)
    assert np.all(np.isfinite(p))


def test_fm_second_order_matches_naive():
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(4, 5, 8)).astype(np.float32)
    got = np.asarray(fm_second_order(jnp.asarray(emb)))
    want = np.zeros(4, np.float32)
    for i in range(5):
        for j in range(i + 1, 5):
            want += np.sum(emb[:, i] * emb[:, j], axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_fm_gradients_flow_to_all_params():
    model = build_model(ModelConfig(name="fm"), INFO)
    inputs = make_inputs()
    y = jnp.asarray(np.random.default_rng(1).integers(0, 2, 6).astype(np.float32))
    variables = model.init(jax.random.key(0), inputs)

    def loss_fn(params):
        out = model.apply({"params": params}, inputs)
        p = jnp.clip(out["output"], 1e-7, 1 - 1e-7)
        return -jnp.mean(y * jnp.log(p) + (1 - y) * jnp.log(1 - p))

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert any(float(jnp.sum(jnp.abs(g))) > 0 for g in flat)


def test_dssm_two_tower_embeddings():
    model = build_model(ModelConfig(name="dssm_double"), INFO)
    inputs = make_inputs()
    variables = model.init(jax.random.key(0), inputs)
    out = model.apply(variables, inputs)
    assert out["user_embedding"].shape == (6, 8)
    assert out["item_embedding"].shape == (6, 8)
    # tower methods usable standalone (offline indexer path)
    u = model.apply(variables, inputs, method=model.user_embedding)
    np.testing.assert_allclose(np.asarray(u), np.asarray(out["user_embedding"]))


def test_unknown_model_raises():
    with pytest.raises(KeyError):
        build_model(ModelConfig(name="nope"), INFO)
