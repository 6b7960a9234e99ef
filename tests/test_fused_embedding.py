"""Fused embedding gather / scatter-Adam kernel parity (interpret mode on the
CPU mesh; the real-TPU path is exercised by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurec.ops.pallas.embedding_update import (
    fused_scatter_adam,
    gather_rows_sorted,
    make_scatter_plan,
    pick_block_rows,
    scatter_adam_reference,
    scatter_adam_sorted,
    unpermute_rows,
)


def _case(v, d, n, seed=0, dup_heavy=False):
    rng = np.random.default_rng(seed)
    if dup_heavy:  # sequence-padding-like skew: 40% of ids are id 0
        ids = np.where(
            rng.random(n) < 0.4, 0, rng.integers(0, v, size=n)
        ).astype(np.int64)
    else:
        ids = rng.integers(0, v, size=n).astype(np.int64)
    grads = rng.normal(size=(n, d)).astype(np.float32)
    table = rng.normal(size=(v, d)).astype(np.float32) * 0.05
    m = rng.normal(size=(v, d)).astype(np.float32) * 0.01
    vv = np.abs(rng.normal(size=(v, d))).astype(np.float32) * 0.01
    return (
        jnp.asarray(table),
        jnp.asarray(m),
        jnp.asarray(vv),
        jnp.asarray(ids),
        jnp.asarray(grads),
    )


@pytest.mark.parametrize(
    "v,d,n,dup",
    [
        (1000, 32, 4096, False),
        (1000, 32, 4096, True),  # heavy duplicates (padding id skew)
        (333, 8, 900, False),  # V not a multiple of block_rows
        (2048, 1, 3000, False),  # (V, 1) w-table shape
    ],
)
def test_scatter_adam_parity(v, d, n, dup):
    table, m, vv, ids, grads = _case(v, d, n, dup_heavy=dup)
    step = jnp.int32(3)
    want = scatter_adam_reference(table, m, vv, ids, grads, step, 1e-2)
    got = fused_scatter_adam(
        table, m, vv, ids, grads, step, 1e-2, chunk=256, interpret=True
    )
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(w), np.asarray(g), rtol=2e-5, atol=2e-6)


def test_scatter_adam_multi_chunk_tile():
    # force several grad chunks in one tile: all ids land in rows [0, 64)
    rng = np.random.default_rng(1)
    v, d, n = 256, 16, 2000
    ids = jnp.asarray(rng.integers(0, 64, size=n))
    grads = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    table = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    m = jnp.zeros((v, d), jnp.float32)
    vv = jnp.zeros((v, d), jnp.float32)
    want = scatter_adam_reference(table, m, vv, ids, grads, jnp.int32(1), 1e-3)
    got = fused_scatter_adam(
        table, m, vv, ids, grads, jnp.int32(1), 1e-3, chunk=128, interpret=True
    )
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(w), np.asarray(g), rtol=2e-5, atol=2e-6)


def test_matches_optax_dense_adam():
    import optax

    table, m, vv, ids, grads = _case(500, 8, 1200, seed=4)
    lr, b1, b2, eps = 3e-3, 0.9, 0.999, 1e-7
    tx = optax.adam(lr, b1=b1, b2=b2, eps=eps)
    opt_state = tx.init(table)
    dense_g = jnp.zeros_like(table).at[ids].add(grads)
    upd, _ = tx.update(dense_g, opt_state, table)
    want = optax.apply_updates(table, upd)
    got, _, _ = fused_scatter_adam(
        table, m * 0, vv * 0, ids, grads, jnp.int32(1), lr, b1, b2, eps,
        chunk=256, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), rtol=2e-5, atol=2e-6)


def test_gather_rows_sorted_and_unpermute():
    table, _, _, ids, _ = _case(700, 16, 3000, seed=2)
    plan = make_scatter_plan(ids, 700, pick_block_rows(16, chunk=256), 256)
    rows_sorted = gather_rows_sorted(table, plan, interpret=True)
    want_sorted = jnp.take(table, plan.sids[: plan.n], axis=0)
    np.testing.assert_allclose(
        np.asarray(rows_sorted), np.asarray(want_sorted), rtol=1e-6
    )
    rows = unpermute_rows(rows_sorted, plan)
    want = jnp.take(table, ids.reshape(-1), axis=0)
    np.testing.assert_allclose(np.asarray(rows), np.asarray(want), rtol=1e-6)


def test_unpermute_vjp_is_gather():
    # d(unpermute)/d(rows_sorted) must equal the permutation transpose
    table, _, _, ids, _ = _case(300, 4, 512, seed=3)
    plan = make_scatter_plan(ids, 300, 128, 128)
    rows_sorted = jnp.take(table, plan.sids[: plan.n], axis=0)

    def f(rs):
        return jnp.sum(unpermute_rows(rs, plan) ** 2)

    got = jax.grad(f)(rows_sorted)
    want = jax.grad(lambda rs: jnp.sum(jnp.take(rs, jnp.argsort(plan.order), axis=0) ** 2))(
        rows_sorted
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


# ---------------------------------------------------------------------------
# trainer integration: fused_adam ≡ dense Adam training, step for step
from tpurec.config import (
    EmbeddingConfig,
    ExperimentConfig,
    ModelConfig,
    OptimizerConfig,
    TrainConfig,
)
from tpurec.data.schema import DataInfo
from tpurec.embedding.modules import set_sparse_layout, set_sparse_mode
from tpurec.train import Trainer

INFO = DataInfo.from_dims(["ua", "ub", "ia", "ib"], [11, 7, 13, 5])


@pytest.fixture(autouse=True)
def _reset_flags():
    yield
    set_sparse_mode(False)
    set_sparse_layout("unique")


def _data(n=512, seed=0):
    rng = np.random.default_rng(seed)
    d = {
        name: rng.integers(off, off + dim, size=(n,))
        for name, off, dim in zip(
            INFO.feature_names, INFO.feature_offsets, INFO.feature_dims
        )
    }
    d["label"] = rng.integers(0, 2, n).astype(np.float32)
    return d


def _trainer(model="fm", sparse=False, emb_opt="adam", used_l2=0.0,
             fused_backward="sort_payload"):
    cfg = ExperimentConfig(
        model=ModelConfig(
            name=model, embedding=EmbeddingConfig(dim=8, used_id_l2=used_l2)
        ),
        train=TrainConfig(
            batch_size=128,
            loss="bce",
            log_every_steps=0,
            compute_dtype="float32",
            sparse_embedding=sparse,
            optimizer=OptimizerConfig(
                learning_rate=1e-2, embedding_optimizer=emb_opt,
                fused_backward=fused_backward,
            ),
        ),
    )
    return Trainer(cfg, INFO)


@pytest.mark.parametrize("model,used_l2", [("fm", 0.0), ("deepfm", 0.0), ("fm", 0.01)])
def test_fused_adam_matches_dense_training(model, used_l2):
    batch = _data(128)
    dense = _trainer(model, sparse=False, used_l2=used_l2)
    fused = _trainer(model, sparse=True, emb_opt="fused_adam", used_l2=used_l2)
    ds = dense.init_state(batch)
    fs = fused.init_state(batch)
    db = dense.device_batch(batch)
    dm, fm_ = dense.metrics.init(), fused.metrics.init()
    for i in range(4):
        b = _data(128, seed=i)
        db = dense.device_batch(b)
        ds, dm, dlogs = dense.train_step(ds, db, dm)
        fs, fm_, flogs = fused.train_step(fs, fused.device_batch(b), fm_)
        np.testing.assert_allclose(
            float(dlogs["loss"]), float(flogs["loss"]), rtol=2e-5, atol=1e-6
        )
    # every embedding table must track the dense run exactly
    np.testing.assert_allclose(
        np.asarray(ds.params["v"]["embedding"] if model == "fm" else ds.params["v"]["embedding"]),
        np.asarray(fs.tables["v"]["embedding"]),
        rtol=2e-4, atol=2e-6,
    )
    np.testing.assert_allclose(
        np.asarray(ds.params["w"]["w"]["embedding"]),
        np.asarray(fs.tables["w"]["w"]["embedding"]),
        rtol=2e-4, atol=2e-6,
    )
    # dense params (bias / MLP) must match too
    np.testing.assert_allclose(
        float(ds.params["bias"]), float(fs.params["bias"]), rtol=2e-5, atol=1e-6
    )


@pytest.mark.parametrize("used_l2", [0.0, 0.01])
@pytest.mark.parametrize("alt", ["sort_payload", "xla_packed"])
def test_alt_backends_match_permute_backward(used_l2, alt):
    """The payload-carrying-sort backward (one lax.sort moves the grad
    columns with the id keys; used-id L2 applied in table space) must equal
    the legacy argsort + take(grads, order) permute path step for step."""
    a = _trainer("fm", sparse=True, emb_opt="fused_adam", used_l2=used_l2,
                 fused_backward=alt)
    b = _trainer("fm", sparse=True, emb_opt="fused_adam", used_l2=used_l2,
                 fused_backward="permute")
    batch = _data(128)
    sa, sb = a.init_state(batch), b.init_state(batch)
    ma, mb = a.metrics.init(), b.metrics.init()
    for i in range(3):
        bt = _data(128, seed=i)
        sa, ma, la = a.train_step(sa, a.device_batch(bt), ma)
        sb, mb, lb = b.train_step(sb, b.device_batch(bt), mb)
        np.testing.assert_allclose(
            float(la["loss"]), float(lb["loss"]), rtol=2e-5, atol=1e-6
        )
    np.testing.assert_allclose(
        np.asarray(sa.tables["v"]["embedding"]),
        np.asarray(sb.tables["v"]["embedding"]),
        rtol=2e-5, atol=2e-6,
    )
    np.testing.assert_allclose(
        np.asarray(sa.tables["w"]["w"]["embedding"]),
        np.asarray(sb.tables["w"]["w"]["embedding"]),
        rtol=2e-5, atol=2e-6,
    )


# ---------------------------------------------------------------------------
# sequence datasets through the fused engine (VERDICT r3 #4): padded behavior
# histories + (for DIEN) pipeline-sampled negative series, step-for-step equal
# to dense Adam. used_id_l2 stays 0 here: the fused engine counts each unique
# id once GLOBALLY per step (the reference's tf.unique semantics,
# 5.DIN/ModelManager.py:175-190) while the dense engine counts once per
# lookup site — the two differ exactly when an id reaches the table through
# two calls (DIN's query ids are also profile ids).

SEQ_INFO = DataInfo.from_dims(
    ["u", "i"], [10, 20], sequence_names=["hist"], max_seq_length=8,
    padding_index=0,
)


def _seq_data(n=128, seed=0, with_neg=False):
    rng = np.random.default_rng(seed)
    d = {
        "u": rng.integers(0, 10, size=(n,)),
        "i": rng.integers(10, 30, size=(n,)),
        "label": rng.integers(0, 2, n).astype(np.float32),
    }
    hist = rng.integers(10, 30, size=(n, 8))
    lengths = rng.integers(0, 9, size=(n,))  # include fully-padded rows
    hist = np.where(np.arange(8)[None, :] < lengths[:, None], hist, 0)
    d["hist"] = hist
    if with_neg:
        neg = rng.integers(10, 30, size=(n, 8))
        d["neg_hist"] = np.where(hist != 0, neg, 0)
    return d


def _seq_trainer(model, sparse, emb_opt="adam", model_params=None,
                 fused_backward="permute"):
    cfg = ExperimentConfig(
        model=ModelConfig(
            name=model,
            params={
                "user_features": ["u"],
                "item_features": ["i"],
                "sequence_features": ["hist"],
                "query_features": ["i"],
                **(model_params or {}),
            },
            embedding=EmbeddingConfig(dim=8),
        ),
        train=TrainConfig(
            batch_size=128,
            loss="bce",
            log_every_steps=0,
            compute_dtype="float32",
            sparse_embedding=sparse,
            optimizer=OptimizerConfig(
                learning_rate=1e-2, embedding_optimizer=emb_opt,
                fused_backward=fused_backward,
            ),
        ),
    )
    return Trainer(cfg, SEQ_INFO)


@pytest.mark.parametrize("model,with_neg,backward", [
    ("din", False, "permute"), ("dien", True, "permute"),
    ("din", False, "xla_packed"),
])
def test_fused_adam_matches_dense_on_sequences(model, with_neg, backward):
    batch = _seq_data(128, with_neg=with_neg)
    dense = _seq_trainer(model, sparse=False)
    fused = _seq_trainer(model, sparse=True, emb_opt="fused_adam",
                         fused_backward=backward)
    ds = dense.init_state(batch)
    fs = fused.init_state(batch)
    dm, fm_ = dense.metrics.init(), fused.metrics.init()
    for i in range(4):
        b = _seq_data(128, seed=i, with_neg=with_neg)
        ds, dm, dlogs = dense.train_step(ds, dense.device_batch(b), dm)
        fs, fm_, flogs = fused.train_step(fs, fused.device_batch(b), fm_)
        np.testing.assert_allclose(
            float(dlogs["loss"]), float(flogs["loss"]), rtol=2e-5, atol=1e-6
        )
    np.testing.assert_allclose(
        np.asarray(ds.params["emb"]["embedding"]),
        np.asarray(fs.tables["emb"]["embedding"]),
        rtol=2e-4, atol=2e-6,
    )
    # dense (non-embedding) params track too — the attention/MLP grads saw
    # identical embedded values and masks
    d_leaves = jax.tree.leaves(ds.params["mlp"])
    f_leaves = jax.tree.leaves(fs.params["mlp"])
    for a, b in zip(d_leaves, f_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)


def test_fused_adam_padding_mask_respected():
    """The shipped __mask__ override must reproduce DENSE masking exactly on
    a batch where a padded step holds a hostile (valid-looking) id: if the
    override were missing, the rewritten positions are all nonzero and every
    padded step would suddenly count as valid — a large loss divergence.
    (Bit-exactness against a zero-padded batch is NOT expected: Dice/BN batch
    statistics in DIN's attention MLP see padded positions in both engines,
    same as the reference.)"""
    batch = _seq_data(128, seed=7)
    b2 = {k: np.array(v) for k, v in batch.items()}
    row = int(np.argmax((b2["hist"] == 0).any(axis=1)))
    col = int(np.argmax(b2["hist"][row] == 0))
    b2["hist"][row, col] = 29  # valid id, but masked out
    dense = _seq_trainer("din", sparse=False)
    fused = _seq_trainer("din", sparse=True, emb_opt="fused_adam")
    ds = dense.init_state(batch)
    fs = fused.init_state(batch)
    _, _, dlogs = dense.train_step(ds, dense.device_batch(b2), dense.metrics.init())
    _, _, flogs = fused.train_step(fs, fused.device_batch(b2), fused.metrics.init())
    np.testing.assert_allclose(
        float(dlogs["loss"]), float(flogs["loss"]), rtol=2e-5, atol=1e-6
    )


def test_fused_adam_rejects_in_batch_softmax():
    cfg = ExperimentConfig(
        model=ModelConfig(
            name="mind",
            params={
                "user_features": ["u"],
                "sequence_features": ["hist"],
                "query_features": ["i"],
            },
            embedding=EmbeddingConfig(dim=8),
        ),
        train=TrainConfig(
            batch_size=16, loss="in_batch_softmax", sparse_embedding=True,
            optimizer=OptimizerConfig(embedding_optimizer="fused_adam"),
        ),
    )
    tr = Trainer(cfg, SEQ_INFO)
    with pytest.raises(ValueError, match="in_batch_softmax"):
        _ = tr.train_step


# ---------------------------------------------------------------------------
# 'auto' engine selection (VERDICT r3 #3: selection was a manual config knob)

def _auto_cfg(loss="bce", batch=8192, dim=32, model="fm", params=None):
    return ExperimentConfig(
        model=ModelConfig(
            name=model, params=params or {}, embedding=EmbeddingConfig(dim=dim)
        ),
        train=TrainConfig(
            batch_size=batch, loss=loss,
            optimizer=OptimizerConfig(embedding_optimizer="auto"),
        ),
    )


def test_auto_selects_dense_everywhere():
    """The dense engine (auto-packed narrow-dim lookups) wins or ties the
    fused engine at EVERY shape in the committed A/B matrix — 2M/200k rows
    at d=32, 520k rows at d=128, DIN sequences (engine_ab_results.json) —
    so 'auto' always resolves to dense."""
    from tpurec.train.trainer import resolve_embedding_engine

    info = DataInfo.from_dims([f"f{i}" for i in range(26)], [80_000] * 26)
    for dim in (32, 128):
        got = resolve_embedding_engine(_auto_cfg(dim=dim), info)
        assert not got.train.sparse_embedding
        assert got.train.optimizer.embedding_optimizer == "adam"


def test_auto_selects_dense_for_small_vocab():
    from tpurec.train.trainer import resolve_embedding_engine

    info = DataInfo.from_dims([f"f{i}" for i in range(26)], [7_700] * 26)
    got = resolve_embedding_engine(_auto_cfg(), info)
    assert not got.train.sparse_embedding
    assert got.train.optimizer.embedding_optimizer == "adam"


def test_auto_selects_dense_for_small_vocab_sequences():
    """DIN bench shape (550k ids/step, 21.5k-row table): dense is the
    measured winner (engine_ab_results.json: dense 10.1 ms vs fused 32.3) —
    the engine's per-step sort+permute costs more than the whole dense step
    when the table pass is cheap, so 'auto' keys off table size ONLY."""
    from tpurec.train.trainer import resolve_embedding_engine

    info = DataInfo.from_dims(
        ["u", "i", "t"], [1000, 20000, 500],
        sequence_names=["hist"], max_seq_length=64, padding_index=0,
    )
    got = resolve_embedding_engine(_auto_cfg(), info)
    assert not got.train.sparse_embedding
    assert got.train.optimizer.embedding_optimizer == "adam"


def test_auto_selects_dense_for_large_vocab_sequences():
    from tpurec.train.trainer import resolve_embedding_engine

    info = DataInfo.from_dims(
        ["u", "i", "t"], [1000, 2_000_000, 500],
        sequence_names=["hist"], max_seq_length=64, padding_index=0,
    )
    got = resolve_embedding_engine(_auto_cfg(dim=128), info)
    assert not got.train.sparse_embedding
    assert got.train.optimizer.embedding_optimizer == "adam"


def test_auto_resolves_dense_for_all_losses_and_meshes():
    from tpurec.train.trainer import resolve_embedding_engine

    info = DataInfo.from_dims([f"f{i}" for i in range(26)], [80_000] * 26)
    got = resolve_embedding_engine(_auto_cfg(loss="in_batch_softmax"), info)
    assert not got.train.sparse_embedding
    got2 = resolve_embedding_engine(_auto_cfg(dim=128), info, n_model=2)
    assert not got2.train.sparse_embedding


def test_auto_end_to_end_trains_a_step():
    """Trainer(auto) on a big-vocab narrow-dim tabular config resolves to
    the dense engine (auto-packed lookups) and trains a step."""
    info = DataInfo.from_dims(["a", "b"], [600_000, 600_000])
    cfg = _auto_cfg(batch=256, dim=32)
    rng = np.random.default_rng(0)
    batch = {
        "a": rng.integers(0, 600_000, 256),
        "b": rng.integers(600_000, 1_200_000, 256),
        "label": rng.integers(0, 2, 256).astype(np.float32),
    }
    tr = Trainer(cfg, info)
    assert tr.config.train.optimizer.embedding_optimizer == "adam"
    assert not tr.config.train.sparse_embedding
    state = tr.init_state(batch)
    state, _, logs = tr.train_step(state, tr.device_batch(batch), tr.metrics.init())
    assert np.isfinite(float(logs["loss"]))


# ---------------------------------------------------------------------------
# row-sharded fused engine (VERDICT r4 #9): on a (data=4, model=2) mesh the
# shard_map variant (tables/moments/kernels per model shard, id+grad streams
# per data shard, psum(G) over 'data', psum(rows) over 'model') must equal
# dense Adam training step for step.


def _mesh_trainer(model, mesh_cfg, sparse, emb_opt, used_l2=0.0, info=None,
                  model_params=None):
    cfg = ExperimentConfig(
        mesh=mesh_cfg,
        model=ModelConfig(
            name=model, params=dict(model_params or {}),
            embedding=EmbeddingConfig(dim=8, used_id_l2=used_l2),
        ),
        train=TrainConfig(
            batch_size=128,
            loss="bce",
            log_every_steps=0,
            compute_dtype="float32",
            sparse_embedding=sparse,
            optimizer=OptimizerConfig(
                learning_rate=1e-2, embedding_optimizer=emb_opt
            ),
        ),
    )
    return Trainer(cfg, info or INFO)


@pytest.mark.parametrize("used_l2", [0.0, 0.01])
def test_sharded_fused_adam_matches_dense(used_l2):
    from tpurec.config import MeshConfig

    dense = _mesh_trainer("fm", MeshConfig(data=8, model=1), False, "adam", used_l2)
    fused = _mesh_trainer("fm", MeshConfig(data=4, model=2), True, "fused_adam", used_l2)
    batch = _data(128)
    ds, fs = dense.init_state(batch), fused.init_state(batch)
    dm, fm_ = dense.metrics.init(), fused.metrics.init()
    for i in range(4):
        b = _data(128, seed=i)
        ds, dm, dlogs = dense.train_step(ds, dense.device_batch(b), dm)
        fs, fm_, flogs = fused.train_step(fs, fused.device_batch(b), fm_)
        np.testing.assert_allclose(
            float(dlogs["loss"]), float(flogs["loss"]), rtol=2e-5, atol=1e-6
        )
    nv = INFO.total_dims  # pad_vocab differs with n_model; real rows must match
    np.testing.assert_allclose(
        np.asarray(ds.params["v"]["embedding"])[:nv],
        np.asarray(fs.tables["v"]["embedding"])[:nv],
        rtol=2e-4, atol=2e-6,
    )
    np.testing.assert_allclose(
        np.asarray(ds.params["w"]["w"]["embedding"])[:nv],
        np.asarray(fs.tables["w"]["w"]["embedding"])[:nv],
        rtol=2e-4, atol=2e-6,
    )
    # the fused tables must actually be row-sharded over 'model'
    emb = fs.tables["v"]["embedding"]
    assert len(set(d.id for d in emb.sharding.device_set)) == 8
    shard_rows = {s.index[0] for s in emb.addressable_shards}
    assert len(shard_rows) == 2, shard_rows


def test_sharded_fused_adam_matches_dense_on_sequences():
    from tpurec.config import MeshConfig

    mp = {
        "user_features": ["u"],
        "item_features": ["i"],
        "sequence_features": ["hist"],
        "query_features": ["i"],
    }
    dense = _mesh_trainer(
        "din", MeshConfig(data=8, model=1), False, "adam", info=SEQ_INFO,
        model_params=mp,
    )
    fused = _mesh_trainer(
        "din", MeshConfig(data=4, model=2), True, "fused_adam", info=SEQ_INFO,
        model_params=mp,
    )
    batch = _seq_data(128)
    ds, fs = dense.init_state(batch), fused.init_state(batch)
    dm, fm_ = dense.metrics.init(), fused.metrics.init()
    for i in range(3):
        b = _seq_data(128, seed=i)
        ds, dm, dlogs = dense.train_step(ds, dense.device_batch(b), dm)
        fs, fm_, flogs = fused.train_step(fs, fused.device_batch(b), fm_)
        np.testing.assert_allclose(
            float(dlogs["loss"]), float(flogs["loss"]), rtol=3e-5, atol=2e-6
        )
    nv = SEQ_INFO.total_dims
    np.testing.assert_allclose(
        np.asarray(ds.params["emb"]["embedding"])[:nv],
        np.asarray(fs.tables["emb"]["embedding"])[:nv],
        rtol=3e-4, atol=3e-6,
    )


@pytest.mark.parametrize("model", ["fm", "din"])
def test_dense_packed_gather_matches_plain_dense(model):
    """EmbeddingConfig.dense_packed_gather routes dense lookups through the
    free (V/k, 128) packed view; forward values are exact (0/1 selection
    matmul at HIGHEST precision) and the autodiff scatter accumulates the
    same per-row sums, so training must track the plain path step for step."""
    if model == "fm":
        info, mk = INFO, _data
        params = None
    else:
        info, mk = SEQ_INFO, _seq_data
        params = {
            "user_features": ["u"], "item_features": ["i"],
            "sequence_features": ["hist"], "query_features": ["i"],
        }
    def trainer(packed):
        cfg = ExperimentConfig(
            model=ModelConfig(
                name=model, params=dict(params or {}),
                embedding=EmbeddingConfig(dim=8, dense_packed_gather=packed),
            ),
            train=TrainConfig(
                batch_size=128, loss="bce", log_every_steps=0,
                compute_dtype="float32",
                optimizer=OptimizerConfig(learning_rate=1e-2),
            ),
        )
        return Trainer(cfg, info)

    a, b = trainer(False), trainer(True)
    batch = mk(128)
    sa, sb = a.init_state(batch), b.init_state(batch)
    ma, mb = a.metrics.init(), b.metrics.init()
    for i in range(3):
        bt = mk(128, seed=i)
        sa, ma, la = a.train_step(sa, a.device_batch(bt), ma)
        sb, mb, lb = b.train_step(sb, b.device_batch(bt), mb)
        np.testing.assert_allclose(
            float(la["loss"]), float(lb["loss"]), rtol=2e-5, atol=1e-6
        )
    pa, pb = jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)
    for x, y in zip(pa, pb):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=2e-4, atol=2e-6
        )


def test_sharded_fused_l2_matches_global_fused_on_sequences():
    """used-id L2 counts each unique id once GLOBALLY in both the global
    fused engine (rows-space first-occurrence) and the sharded engine
    (psum'd table-space touched mask) — so the two must track step for step
    on sequence data (dense differs there: it counts per lookup site)."""
    from tpurec.config import MeshConfig

    mp = {
        "user_features": ["u"], "item_features": ["i"],
        "sequence_features": ["hist"], "query_features": ["i"],
    }

    def trainer(mesh_cfg):
        cfg = ExperimentConfig(
            mesh=mesh_cfg,
            model=ModelConfig(
                name="din", params=dict(mp),
                embedding=EmbeddingConfig(dim=8, used_id_l2=0.01),
            ),
            train=TrainConfig(
                batch_size=128, loss="bce", log_every_steps=0,
                compute_dtype="float32", sparse_embedding=True,
                optimizer=OptimizerConfig(
                    learning_rate=1e-2, embedding_optimizer="fused_adam"
                ),
            ),
        )
        return Trainer(cfg, SEQ_INFO)

    g = trainer(MeshConfig(data=8, model=1))
    sh = trainer(MeshConfig(data=4, model=2))
    batch = _seq_data(128)
    sg, ss = g.init_state(batch), sh.init_state(batch)
    mg, msh = g.metrics.init(), sh.metrics.init()
    for i in range(3):
        b = _seq_data(128, seed=i)
        sg, mg, lg = g.train_step(sg, g.device_batch(b), mg)
        ss, msh, lsh = sh.train_step(ss, sh.device_batch(b), msh)
        np.testing.assert_allclose(
            float(lg["loss"]), float(lsh["loss"]), rtol=3e-5, atol=2e-6
        )
        np.testing.assert_allclose(
            float(lg["used_id_l2"]), float(lsh["used_id_l2"]), rtol=3e-5, atol=2e-6
        )
    nv = SEQ_INFO.total_dims
    np.testing.assert_allclose(
        np.asarray(sg.tables["emb"]["embedding"])[:nv],
        np.asarray(ss.tables["emb"]["embedding"])[:nv],
        rtol=3e-4, atol=3e-6,
    )
