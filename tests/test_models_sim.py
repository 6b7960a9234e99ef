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
from tpurec.data.loader import ArrayLoader
from tpurec.data.schema import DataInfo
from tpurec.models import build_model
from tpurec.models.sim import CoActionUnit
from tpurec.ops.hashing import (
    gather_steps,
    hamming_similarity,
    lsh_attention,
    simhash_bits,
    sketch_pool,
    topk_select,
)
from tpurec.train import Trainer

INFO = DataInfo(
    feature_names=["item_id", "user_tag", "item_tag"],
    feature_dims=[100, 10, 12],
    feature_offsets=[1, 101, 111],
    total_dims=123,
    sequence_names=["history"],
    max_seq_length=32,
    padding_index=0,
    user_features=["user_tag"],
    item_features=["item_id", "item_tag"],
)


def make_batch(batch=6, seed=0, L=32):
    rng = np.random.default_rng(seed)
    seq = rng.integers(1, 101, size=(batch, L))
    lengths = rng.integers(4, L + 1, size=(batch,))
    seq = np.where(np.arange(L)[None, :] < lengths[:, None], seq, 0)
    return {
        "item_id": jnp.asarray(rng.integers(1, 101, size=(batch,))),
        "user_tag": jnp.asarray(rng.integers(101, 111, size=(batch,))),
        "item_tag": jnp.asarray(rng.integers(111, 123, size=(batch,))),
        "history": jnp.asarray(seq),
        "label": jnp.asarray(rng.integers(0, 2, batch).astype(np.float32)),
    }


@pytest.mark.parametrize("name", ["sim", "can", "eta"])
def test_forward_contract(name):
    model = build_model(ModelConfig(name=name), INFO)
    inputs = make_batch()
    variables = model.init(jax.random.key(0), inputs)
    out = model.apply(variables, inputs, train=True, rngs={"dropout": jax.random.key(1)})
    assert out["gsu_logits"].shape == (6, 2)
    assert out["esu_logits"].shape == (6, 2)
    p = np.asarray(out["output"])
    assert np.all((p >= 0) & (p <= 1)) and np.all(np.isfinite(p))


class TestHashingOps:
    def test_topk_select_excludes_padding(self):
        scores = jnp.asarray([[5.0, 1.0, 9.0, 7.0]])
        mask = jnp.asarray([[1.0, 1.0, 0.0, 1.0]])  # best raw score is masked
        idx, valid = topk_select(scores, mask, 2)
        assert set(np.asarray(idx)[0].tolist()) == {3, 0}
        np.testing.assert_array_equal(np.asarray(valid), [[1.0, 1.0]])

    def test_topk_valid_mask_when_fewer_than_k(self):
        scores = jnp.asarray([[5.0, 1.0, 9.0]])
        mask = jnp.asarray([[1.0, 0.0, 0.0]])
        idx, valid = topk_select(scores, mask, 2)
        assert np.asarray(valid)[0].tolist() == [1.0, 0.0]

    def test_gather_steps(self):
        seq = jnp.arange(2 * 4 * 3).reshape(2, 4, 3)
        idx = jnp.asarray([[3, 0], [1, 1]])
        out = np.asarray(gather_steps(seq, idx))
        np.testing.assert_array_equal(out[0, 0], np.asarray(seq)[0, 3])
        np.testing.assert_array_equal(out[1, 1], np.asarray(seq)[1, 1])

    def test_simhash_close_vectors_similar_codes(self):
        rng = np.random.default_rng(0)
        proj = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32))
        base = rng.normal(size=(1, 16)).astype(np.float32)
        near = base + 0.01 * rng.normal(size=(1, 16)).astype(np.float32)
        far = rng.normal(size=(1, 16)).astype(np.float32)
        b0 = simhash_bits(jnp.asarray(base), proj)
        bn = simhash_bits(jnp.asarray(near), proj)
        bf = simhash_bits(jnp.asarray(far), proj)
        sim_near = int(hamming_similarity(b0, bn[:, None, :])[0, 0])
        sim_far = int(hamming_similarity(b0, bf[:, None, :])[0, 0])
        assert sim_near > sim_far

    def test_lsh_attention_stays_in_bucket(self):
        rng = np.random.default_rng(1)
        # two well-separated clusters → different buckets
        a = np.tile(np.array([10.0, 0.0, 0.0, 0.0]), (3, 1))
        b = np.tile(np.array([-10.0, 0.0, 0.0, 0.0]), (3, 1))
        x = jnp.asarray(np.concatenate([a, b])[None].astype(np.float32))  # (1, 6, 4)
        v = jnp.asarray(rng.normal(size=(1, 6, 4)).astype(np.float32))
        proj = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
        out = np.asarray(lsh_attention(x, v, proj))
        # cluster-a queries attend only to cluster-a values
        expect_a = np.asarray(v)[0, :3].mean(0)
        np.testing.assert_allclose(out[0, 0], expect_a, rtol=1e-4)

    def test_sketch_pool_hits_only_colliding_steps(self):
        rng = np.random.default_rng(2)
        proj = jnp.asarray(rng.normal(size=(2, 4, 6)).astype(np.float32))
        query = jnp.asarray([[5.0, 5.0, 5.0, 5.0]])
        seq = jnp.asarray(
            [[[5.0, 5.0, 5.0, 5.0], [-5.0, -5.0, -5.0, -5.0]]], jnp.float32
        )
        mask = jnp.ones((1, 2))
        out = np.asarray(sketch_pool(seq, mask, proj, query))
        np.testing.assert_allclose(out[0], [5.0, 5.0, 5.0, 5.0], rtol=1e-5)


def test_coaction_packed_dim():
    assert CoActionUnit.packed_dim(8, (4, 4)) == 8 * 4 + 4 + 4 * 4 + 4


def test_sim_trains_with_gsu_esu_loss():
    rng = np.random.default_rng(0)
    n, L = 2048, 32
    # label = whether candidate item appears in history (pure attention signal)
    seq = rng.integers(1, 101, size=(n, L))
    cand = rng.integers(1, 101, size=(n,))
    put = rng.random(n) < 0.5
    pos = rng.integers(0, L, size=(n,))
    seq[np.arange(n)[put], pos[put]] = cand[put]
    label = (seq == cand[:, None]).any(axis=1).astype(np.float32)
    data = {
        "item_id": cand,
        "user_tag": rng.integers(101, 111, n),
        "item_tag": rng.integers(111, 123, n),
        "history": seq,
        "label": label,
    }
    cfg = ExperimentConfig(
        model=ModelConfig(name="sim", embedding=EmbeddingConfig(dim=16)),
        train=TrainConfig(
            batch_size=256, epochs=8, log_every_steps=0, loss="gsu_esu",
            compute_dtype="float32", optimizer=OptimizerConfig(learning_rate=0.02),
        ),
    )
    trainer = Trainer(cfg, INFO)
    loader = ArrayLoader(data, 256, seed=0)
    state, report = trainer.run(lambda: iter(loader), lambda: iter(loader))
    # identity-match signal: random=0.5, SIM ≈0.69 @ epoch 8 and still
    # climbing (0.74 @ 12) — unit test asserts clear learning, parity runs
    # belong to the benchmark harness
    assert report["best_eval"]["auc"] > 0.64, report


def test_eta_lsh_self_attention_mode():
    """ETA's opt-in Reformer-style bucketed self-attention over the long-term
    series (reference LSHAttention, 7.SIM/CustomLayers.py:453-515)."""
    from tpurec.config import EmbeddingConfig, ModelConfig

    model = build_model(
        ModelConfig(
            name="eta",
            embedding=EmbeddingConfig(dim=16),
            params={"lsh_self_attention": True},
        ),
        INFO,
    )
    inputs = make_batch()
    variables = model.init(jax.random.key(0), inputs)
    assert "lsh_self_proj" in variables["constants"]
    out = model.apply(variables, inputs, train=True, rngs={"dropout": jax.random.key(1)})
    assert out["esu_logits"].shape == (6, 2)
    assert np.all(np.isfinite(np.asarray(out["esu_logits"])))
    # grads flow through the bucketed attention path
    def loss(p):
        o = model.apply(
            {"params": p, "constants": variables["constants"]},
            inputs, train=True, rngs={"dropout": jax.random.key(1)},
        )
        return jnp.mean(o["esu_logits"] ** 2)

    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g))
