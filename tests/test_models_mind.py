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
from tpurec.data.schema import DataInfo
from tpurec.models import build_model
from tpurec.models.mind import greedy_diverse_topk
from tpurec.ops.capsule import CapsuleRouting, LabelAwareAttention, valid_capsule_mask

INFO = DataInfo(
    feature_names=["item_id", "user_tag", "item_tag"],
    feature_dims=[100, 10, 12],
    feature_offsets=[1, 101, 111],
    total_dims=123,
    sequence_names=["history"],
    max_seq_length=16,
    padding_index=0,
    user_features=["user_tag"],
    item_features=["item_id", "item_tag"],
)

RETRIEVAL = ["mind", "sdm", "comirec", "sine"]


def make_batch(batch=6, seed=0, L=16):
    rng = np.random.default_rng(seed)
    seq = rng.integers(1, 101, size=(batch, L))
    lengths = rng.integers(2, L + 1, size=(batch,))
    seq = np.where(np.arange(L)[None, :] < lengths[:, None], seq, 0)
    return {
        "item_id": jnp.asarray(rng.integers(1, 101, size=(batch,))),
        "user_tag": jnp.asarray(rng.integers(101, 111, size=(batch,))),
        "item_tag": jnp.asarray(rng.integers(111, 123, size=(batch,))),
        "history": jnp.asarray(seq),
    }


@pytest.mark.parametrize("name", RETRIEVAL)
def test_forward_contract(name):
    model = build_model(ModelConfig(name=name, embedding=EmbeddingConfig(dim=16)), INFO)
    inputs = make_batch()
    variables = model.init(jax.random.key(0), inputs)
    out = model.apply(variables, inputs, train=True, rngs={"dropout": jax.random.key(1)})
    assert out["user_embedding"].shape == (6, 16)
    assert out["item_embedding"].shape == (6, 16)
    assert np.all(np.isfinite(np.asarray(out["user_embedding"])))
    if name == "sine":
        assert "auxiliary_loss" in out


@pytest.mark.parametrize("variant", ["dr", "sa"])
def test_comirec_variants(variant):
    model = build_model(ModelConfig(name="comirec", params={"variant": variant}, embedding=EmbeddingConfig(dim=16)), INFO)
    inputs = make_batch()
    v = model.init(jax.random.key(0), inputs)
    out = model.apply(v, inputs)
    assert out["interest_capsules"].shape == (6, 4, 16)


class TestCapsuleRouting:
    def test_masked_steps_do_not_affect_capsules(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 8, 4)).astype(np.float32))
        mask = jnp.asarray([[1, 1, 1, 1, 0, 0, 0, 0], [1] * 8], jnp.float32)
        routing = CapsuleRouting(num_capsules=3, dim=4)
        v = routing.init(jax.random.key(0), x, mask)
        caps1, _ = routing.apply(v, x, mask)
        x2 = x.at[0, 5].set(50.0)
        caps2, _ = routing.apply(v, x2, mask)
        np.testing.assert_allclose(np.asarray(caps1[0]), np.asarray(caps2[0]), rtol=1e-5)

    def test_valid_capsule_mask_log2_rule(self):
        mask = valid_capsule_mask(jnp.asarray([1, 2, 4, 16, 1000]), 4)
        np.testing.assert_array_equal(
            np.asarray(mask),
            [
                [1, 0, 0, 0],
                [1, 0, 0, 0],
                [1, 1, 0, 0],
                [1, 1, 1, 1],
                [1, 1, 1, 1],
            ],
        )

    def test_squash_norm_below_one(self):
        from tpurec.ops.capsule import squash

        x = jnp.asarray(np.random.default_rng(1).normal(size=(5, 8)) * 10)
        norms = np.linalg.norm(np.asarray(squash(x)), axis=-1)
        assert np.all(norms < 1.0)

    def test_label_aware_attention_prefers_aligned_capsule(self):
        caps = jnp.asarray(
            [[[1.0, 0.0], [0.0, 1.0]]], jnp.float32
        )  # two orthogonal capsules
        mask = jnp.ones((1, 2))
        target = jnp.asarray([[10.0, 0.1]])
        att = LabelAwareAttention(power=2.0)
        v = att.init(jax.random.key(0), caps, mask, target)
        out = np.asarray(att.apply(v, caps, mask, target))[0]
        assert out[0] > 0.99  # nearly all weight on capsule 0


def test_greedy_diverse_topk_prefers_new_categories():
    scores = jnp.asarray([[5.0, 4.9, 4.8, 1.0]])  # one capsule
    cats = jnp.asarray([0, 0, 1, 2])
    # without diversity: picks 0,1 (same category); with strong diversity the
    # second pick jumps to the category-1 item
    plain = np.asarray(greedy_diverse_topk(scores, cats, k=2, diversity_weight=0.0))
    diverse = np.asarray(greedy_diverse_topk(scores, cats, k=2, diversity_weight=0.5))
    assert list(plain) == [0, 1]
    assert list(diverse) == [0, 2]


def test_mind_trains_with_in_batch_softmax():
    rng = np.random.default_rng(0)
    n = 1024
    L = 16
    # structured: users repeat one dominant item in history; target equals it
    dominant = rng.integers(1, 101, n)
    seq = np.tile(dominant[:, None], (1, L))
    drop = rng.random((n, L)) < 0.2
    seq = np.where(drop, 0, seq)
    data = {
        "item_id": dominant,
        "user_tag": rng.integers(101, 111, n),
        "item_tag": rng.integers(111, 123, n),
        "history": seq,
    }
    cfg = ExperimentConfig(
        model=ModelConfig(name="mind", embedding=EmbeddingConfig(dim=16)),
        train=TrainConfig(
            batch_size=128, epochs=3, log_every_steps=0, loss="in_batch_softmax",
            compute_dtype="float32", optimizer=OptimizerConfig(learning_rate=0.01),
        ),
    )
    from tpurec.data.loader import ArrayLoader
    from tpurec.train import Trainer

    trainer = Trainer(cfg, INFO)
    loader = ArrayLoader(data, 128, seed=0)
    state, report = trainer.run(lambda: iter(loader), lambda: iter(loader))
    # in-batch top-1 accuracy: random = 1/128 ≈ 0.008; MIND reaches ~0.3 in
    # 3 epochs and keeps climbing (duplicate dominant items across users put
    # a ceiling below 1.0)
    assert report["best_eval"]["accuracy"] > 0.2, report


@pytest.mark.parametrize("name", RETRIEVAL)
@pytest.mark.parametrize("num_neg", [0, 8])
def test_normalize_logits_contract(name, num_neg):
    """normalize_logits: item embeddings unit-norm, logit_scale param exists,
    sampled logits (if any) match the cosine geometry, outputs finite."""
    model = build_model(
        ModelConfig(
            name=name,
            params={"normalize_logits": True, "num_sampled_negatives": num_neg},
            embedding=EmbeddingConfig(dim=16),
        ),
        INFO,
    )
    inputs = make_batch()
    rngs = {"params": jax.random.key(0), "sampling": jax.random.key(1)}
    variables = model.init(rngs, inputs, train=True)
    out = model.apply(
        variables, inputs, train=True,
        rngs={"dropout": jax.random.key(2), "sampling": jax.random.key(3)},
    )
    item = np.asarray(out["item_embedding"], np.float32)
    np.testing.assert_allclose(np.linalg.norm(item, axis=-1), 1.0, atol=1e-3)
    flat = {jax.tree_util.keystr(p) for p, _ in
            jax.tree_util.tree_leaves_with_path(variables["params"])}
    assert any("logit_scale" in k for k in flat), sorted(flat)
    # user side carries the temperature: |output| = scale * |cos| <= scale
    scale = float(np.log1p(np.exp(10.0)))  # softplus of the init constant
    assert np.all(np.abs(np.asarray(out["output"])) <= scale + 1e-3)
    assert np.all(np.isfinite(np.asarray(out["output"])))
    if num_neg:
        assert out["logits"].shape == (6, 1 + num_neg)
        assert np.all(np.abs(np.asarray(out["logits"])) <= scale + 1e-3)


def test_normalize_logits_preserves_ranking():
    """The positive temperature rescales per-user scores monotonically, so the
    serving top-k from user@item.T is unchanged vs plain normalized cosine."""
    model = build_model(
        ModelConfig(
            name="mind",
            params={"normalize_logits": True},
            embedding=EmbeddingConfig(dim=16),
        ),
        INFO,
    )
    inputs = make_batch(batch=8)
    variables = model.init(jax.random.key(0), inputs)
    out = model.apply(variables, inputs)
    u = np.asarray(out["user_embedding"], np.float32)
    i = np.asarray(out["item_embedding"], np.float32)
    scores = u @ i.T
    cos = (u / np.linalg.norm(u, axis=-1, keepdims=True)) @ i.T
    np.testing.assert_array_equal(
        np.argsort(-scores, axis=-1), np.argsort(-cos, axis=-1)
    )
