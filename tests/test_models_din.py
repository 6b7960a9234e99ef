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
from tpurec.data.generators import SequenceDataGenerator
from tpurec.data.loader import ArrayLoader, load_columnar, shard_paths
from tpurec.data.schema import DataInfo
from tpurec.data.synthetic import make_behavior_sequence_raw
from tpurec.models import build_model
from tpurec.ops.attention import DinTargetAttention
from tpurec.train import Trainer

INFO = DataInfo(
    feature_names=["item_id", "user_tag", "item_tag"],
    feature_dims=[100, 10, 12],
    feature_offsets=[1, 101, 111],
    total_dims=123,
    sequence_names=["history"],
    label_names=["label"],
    max_seq_length=20,
    padding_index=0,
    user_features=["user_tag"],
    item_features=["item_id", "item_tag"],
)


def make_batch(batch=6, seed=0, L=20):
    rng = np.random.default_rng(seed)
    inputs = {
        "item_id": jnp.asarray(rng.integers(1, 101, size=(batch,))),
        "user_tag": jnp.asarray(rng.integers(101, 111, size=(batch,))),
        "item_tag": jnp.asarray(rng.integers(111, 123, size=(batch,))),
    }
    seq = rng.integers(1, 101, size=(batch, L))
    lengths = rng.integers(2, L + 1, size=(batch,))
    seq = np.where(np.arange(L)[None, :] < lengths[:, None], seq, 0)
    inputs["history"] = jnp.asarray(seq)
    inputs["label"] = jnp.asarray(rng.integers(0, 2, batch).astype(np.float32))
    return inputs


@pytest.mark.parametrize("name", ["din", "dien", "dsin"])
def test_forward_contract(name):
    model = build_model(ModelConfig(name=name), INFO)
    inputs = make_batch()
    variables = model.init(jax.random.key(0), inputs)
    out = model.apply(
        variables, inputs, train=True, rngs={"dropout": jax.random.key(1)}
    )
    p = np.asarray(out["output"])
    assert p.shape == (6,)
    assert np.all((p >= 0) & (p <= 1)) and np.all(np.isfinite(p))
    if name == "dien":
        assert "auxiliary_loss" in out and np.isfinite(float(out["auxiliary_loss"]))


def test_din_attention_respects_mask():
    """Changing a padded step's embedding must not change the pooled result."""
    att = DinTargetAttention()
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32))
    keys = jnp.asarray(rng.normal(size=(2, 5, 8)).astype(np.float32))
    mask = jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], jnp.float32)
    v = att.init(jax.random.key(0), q, keys, mask)
    out1, _ = att.apply(v, q, keys, mask)
    keys2 = keys.at[0, 4].set(100.0)
    out2, _ = att.apply(v, q, keys2, mask)
    np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(out2[0]), rtol=1e-5)
    # without the mask the modified padded step DOES leak into row 0
    leak1, _ = att.apply(v, q, keys, None)
    leak2, _ = att.apply(v, q, keys2, None)
    assert not np.allclose(np.asarray(leak1[0]), np.asarray(leak2[0]))


def test_dien_gradients_finite():
    model = build_model(ModelConfig(name="dien"), INFO)
    inputs = make_batch()
    v = model.init(jax.random.key(0), inputs)

    def loss(p):
        out = model.apply({"params": p}, inputs, train=True, rngs={"dropout": jax.random.key(1)})
        return jnp.mean(out["logit"] ** 2) + out["auxiliary_loss"]

    g = jax.grad(loss)(v["params"])
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree.leaves(g))


def test_din_end_to_end_sequence_pipeline(tmp_path):
    """ch.5 pipeline: behavior logs → SequenceDataGenerator → DIN training
    with used-id L2; AUC beats random convincingly."""
    raw = make_behavior_sequence_raw(
        str(tmp_path / "raw"), n_users=400, n_items=200, n_events=20_000, max_history=20, seed=0
    )
    gen = SequenceDataGenerator(str(tmp_path / "gen"), raw["events_path"], max_seq_length=20)
    info = gen.run_all()
    train = load_columnar(shard_paths(str(tmp_path / "gen"), "train"))
    test = load_columnar(shard_paths(str(tmp_path / "gen"), "test"))
    assert train["history"].shape[1] == 20
    cfg = ExperimentConfig(
        model=ModelConfig(
            name="din", embedding=EmbeddingConfig(dim=16, used_id_l2=1e-6)
        ),
        train=TrainConfig(
            batch_size=256, epochs=4, log_every_steps=0, compute_dtype="float32",
            # two parallel series double the behavior-block width; 0.005 is
            # stable where 0.02 oscillated (measured: 0.637 vs 0.595 @ epoch 4)
            optimizer=OptimizerConfig(learning_rate=0.005),
        ),
    )
    trainer = Trainer(cfg, info)
    state, report = trainer.run(
        lambda: iter(ArrayLoader(train, 256, seed=1)),
        lambda: iter(ArrayLoader(test, 256, shuffle=False)),
    )
    # oracle AUC of this generator is ≈0.89; DIN passes 0.62 by epoch 4 and
    # keeps climbing — full-convergence parity is checked
    # by the benchmark harness, not unit tests
    assert report["best_eval"]["auc"] > 0.62, report


def test_dien_pipeline_sampled_negatives(tmp_path):
    """neg_<series> columns from the generator feed the DIEN aux loss
    (reference neg_hist_seq, 5.DIN/DataGenerator.py + get_auxiliary_loss
    5.DIN/CustomLayers.py:434-453)."""
    raw = make_behavior_sequence_raw(
        str(tmp_path / "raw"), n_users=80, n_items=60, n_events=600, max_history=12
    )
    gen = SequenceDataGenerator(str(tmp_path / "gen"), raw["events_path"], max_seq_length=12)
    info = gen.run_all()
    train = load_columnar(shard_paths(str(tmp_path / "gen"), "train"))
    for s in info.sequence_names:
        neg, hist = train[f"neg_{s}"], train[s]
        # negatives live in the same feature block, only at real positions,
        # and never equal the positive behavior
        assert neg.shape == hist.shape
        assert np.all((neg == 0) == (hist == 0))
        real = hist != 0
        assert np.all(neg[real] != hist[real])
        j = info.feature_names.index(
            info.sequence_query_features[info.sequence_names.index(s)]
        )
        off, dim = info.feature_offsets[j], info.feature_dims[j]
        assert neg[real].min() >= off and neg[real].max() < off + dim

    # model consumes them: aux loss differs from the batch-rolled fallback
    model = build_model(ModelConfig(name="dien", embedding=EmbeddingConfig(dim=8)), info)
    batch = {k: jnp.asarray(v[:32]) for k, v in train.items()}
    variables = model.init(jax.random.key(0), batch)
    out_neg = model.apply(
        variables, batch, train=True, rngs={"dropout": jax.random.key(1)}
    )
    batch_no_neg = {k: v for k, v in batch.items() if not k.startswith("neg_")}
    out_roll = model.apply(
        variables, batch_no_neg, train=True, rngs={"dropout": jax.random.key(1)}
    )
    a, b = float(out_neg["auxiliary_loss"]), float(out_roll["auxiliary_loss"])
    assert np.isfinite(a) and np.isfinite(b) and a != b


def test_dien_sampled_negatives_sparse_mode(tmp_path):
    """Sparse-embedding mode rewrites neg_* ids into row-position space too —
    training with sampled negatives must match shapes and stay finite."""
    raw = make_behavior_sequence_raw(
        str(tmp_path / "raw"), n_users=60, n_items=50, n_events=400, max_history=8
    )
    gen = SequenceDataGenerator(str(tmp_path / "gen"), raw["events_path"], max_seq_length=8)
    info = gen.run_all()
    train = load_columnar(shard_paths(str(tmp_path / "gen"), "train"))
    cfg = ExperimentConfig(
        model=ModelConfig(name="dien", embedding=EmbeddingConfig(dim=8)),
        train=TrainConfig(
            batch_size=64, epochs=1, log_every_steps=0, loss="bce",
            sparse_embedding=True,
            optimizer=OptimizerConfig(learning_rate=0.01),
        ),
    )
    trainer = Trainer(cfg, info)
    state, report = trainer.run(
        lambda: iter(ArrayLoader(train, 64, seed=1)),
        lambda: iter(ArrayLoader(train, 64, shuffle=False)),
    )
    assert np.isfinite(report["best_eval"]["loss"])
