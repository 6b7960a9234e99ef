import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurec.config import ModelConfig
from tpurec.data.schema import DataInfo
from tpurec.models import build_model
from tpurec.ops.conv import k_max_pool
from tpurec.ops.interactions import (
    BilinearInteraction,
    CIN,
    CrossNetwork,
    pair_indices,
)

INFO = DataInfo.from_dims(
    ["uid", "iid", "utag", "itag"],
    [50, 80, 10, 12],
    continuous_names=["c1", "c2", "c3"],
)

DCN_FAMILY = [
    "dcn",
    "xdeepfm",
    "nfm",
    "deep_crossing",
    "fnn",
    "ccpm",
    "fgcnn",
    "afm",
    "fibinet",
    "autoint",
]


def make_inputs(batch=6, seed=0):
    rng = np.random.default_rng(seed)
    inputs = {}
    for name, dim, off in zip(INFO.feature_names, INFO.feature_dims, INFO.feature_offsets):
        inputs[name] = jnp.asarray(rng.integers(off, off + dim, size=(batch,)))
    for c in INFO.continuous_names:
        inputs[c] = jnp.asarray(rng.random(batch, dtype=np.float32))
    return inputs


@pytest.mark.parametrize("name", DCN_FAMILY)
def test_forward_contract(name):
    model = build_model(ModelConfig(name=name), INFO)
    inputs = make_inputs()
    variables = model.init(jax.random.key(0), inputs)
    out = model.apply(
        variables, inputs, train=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.key(1)},
    )[0]
    p = np.asarray(out["output"])
    assert p.shape == (6,)
    assert np.all((p >= 0) & (p <= 1)) and np.all(np.isfinite(p))


def test_cross_network_matches_recurrence():
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(3, 6)).astype(np.float32))
    net = CrossNetwork(num_layers=2)
    v = net.init(jax.random.key(0), x0)
    got = np.asarray(net.apply(v, x0))
    # manual recurrence
    x = np.asarray(x0)
    for i in range(2):
        w = np.asarray(v["params"][f"w_{i}"])
        b = np.asarray(v["params"][f"b_{i}"])
        xw = x @ w  # (B,1)
        x = np.asarray(x0) * xw + b + x
    np.testing.assert_allclose(got, x, rtol=1e-5)


def test_cin_shapes_and_naive_first_level():
    rng = np.random.default_rng(1)
    emb = jnp.asarray(rng.normal(size=(2, 4, 6)).astype(np.float32))
    net = CIN(layer_sizes=(5, 3))
    v = net.init(jax.random.key(0), emb)
    out = net.apply(v, emb)
    assert out.shape == (2, 8)
    # first level: z = outer(emb, emb) compressed by the (H*F, size) matrix
    kernel = np.asarray(v["params"]["compress_0"])  # (16, 5)
    z = np.einsum("bhd,bfd->bhfd", emb, emb).reshape(2, 16, 6)
    level1 = np.einsum("bkd,ks->bsd", z, kernel)
    np.testing.assert_allclose(np.asarray(out)[:, :5], level1.sum(-1), rtol=1e-4)


def test_bilinear_modes_differ():
    rng = np.random.default_rng(2)
    emb = jnp.asarray(rng.normal(size=(2, 4, 5)).astype(np.float32))
    outs = {}
    for mode in ("all", "each", "interaction"):
        m = BilinearInteraction(mode)
        v = m.init(jax.random.key(3), emb)
        outs[mode] = np.asarray(m.apply(v, emb))
        assert outs[mode].shape == (2, 6, 5)


def test_k_max_pool():
    x = jnp.asarray([[3.0, 1.0, 2.0], [0.0, -1.0, 5.0]])[:, :, None]
    out = np.asarray(k_max_pool(x, 2, axis=1))[:, :, 0]
    np.testing.assert_array_equal(out, [[3.0, 2.0], [5.0, 0.0]])


def test_pair_indices_count():
    iu, ju = pair_indices(5)
    assert len(iu) == 10
    assert all(i < j for i, j in zip(iu, ju))


def test_fnn_init_from_fm():
    from tpurec.models.dcn import FNN

    fm = build_model(ModelConfig(name="fm"), INFO)
    fnn = build_model(ModelConfig(name="fnn"), INFO)
    inputs = make_inputs()
    fm_v = fm.init(jax.random.key(0), inputs)
    fnn_v = fnn.init(jax.random.key(1), inputs)
    import flax

    fm_params = flax.core.unfreeze(jax.tree.map(lambda x: x, fm_v["params"]))
    fnn_params = flax.core.unfreeze(jax.tree.map(lambda x: x, fnn_v["params"]))
    from flax import linen as nn

    fm_params = nn.unbox(fm_params)
    fnn_params = nn.unbox(fnn_params)
    seeded = FNN.init_embedding_from_fm(fnn_params, fm_params)
    np.testing.assert_array_equal(
        np.asarray(seeded["emb"]["embedding"]), np.asarray(fm_params["v"]["embedding"])
    )
