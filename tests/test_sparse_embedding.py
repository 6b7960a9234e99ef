"""Sparse embedding update engine: math parity with dense optax.adam on the
touched rows, untouched rows frozen, end-to-end trainer equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpurec.config import (
    EmbeddingConfig,
    ExperimentConfig,
    ModelConfig,
    OptimizerConfig,
    TrainConfig,
)
from tpurec.data.schema import DataInfo
from tpurec.embedding.modules import set_sparse_mode
from tpurec.embedding.sparse import (
    init_sparse_adam,
    lookup_positions,
    sparse_adam,
    unique_fixed,
)
from tpurec.train import Trainer

INFO = DataInfo.from_dims(
    ["ua", "ub", "ia", "ib"], [11, 7, 13, 5]
)


@pytest.fixture(autouse=True)
def _reset_sparse_mode():
    yield
    set_sparse_mode(False)


def make_data(n=512, seed=0):
    rng = np.random.default_rng(seed)
    data = {
        name: rng.integers(off, off + dim, size=(n,))
        for name, off, dim in zip(INFO.feature_names, INFO.feature_offsets, INFO.feature_dims)
    }
    data["label"] = rng.integers(0, 2, n).astype(np.float32)
    return data


class TestUniqueFixed:
    def test_dedup_and_padding(self):
        ids = jnp.asarray([5, 3, 5, 3, 9])
        out = np.asarray(unique_fixed(ids, pad_id=100))
        assert sorted(out.tolist()) == [3, 5, 9, 100, 100]
        assert np.all(out == np.sort(out))

    def test_positions_exact(self):
        ids = jnp.asarray([4, 8, 4, 2])
        uniq = unique_fixed(ids, pad_id=50)
        pos = np.asarray(lookup_positions(uniq, ids))
        u = np.asarray(uniq)
        np.testing.assert_array_equal(u[pos], np.asarray(ids))


class TestSparseAdam:
    def test_matches_dense_adam_on_touched_rows(self):
        rng = np.random.default_rng(1)
        table = jnp.asarray(rng.normal(size=(32, 8)).astype(np.float32))
        grad_dense = np.zeros((32, 8), np.float32)
        touched = np.array([3, 7, 20])
        grad_dense[touched] = rng.normal(size=(3, 8))
        lr, b1, b2, eps = 0.01, 0.9, 0.999, 1e-7
        # dense optax
        tx = optax.adam(lr, b1=b1, b2=b2, eps=eps)
        opt_state = tx.init(table)
        updates, _ = tx.update(jnp.asarray(grad_dense), opt_state, table)
        dense_out = optax.apply_updates(table, updates)
        # sparse
        ids = jnp.asarray(np.repeat(touched, 2))  # with duplicates
        uniq = unique_fixed(ids, pad_id=31)
        grad_rows = jnp.asarray(grad_dense)[uniq]
        sp_table, _ = sparse_adam(
            table, init_sparse_adam(table), uniq, grad_rows,
            jnp.asarray(1), lr, b1, b2, eps,
        )
        np.testing.assert_allclose(
            np.asarray(sp_table)[touched], np.asarray(dense_out)[touched], rtol=1e-5
        )
        # untouched rows unchanged (31 is the sacrificial row, exclude it)
        untouched = [i for i in range(31) if i not in touched]
        np.testing.assert_array_equal(
            np.asarray(sp_table)[untouched], np.asarray(table)[untouched]
        )


class TestSparseTrainer:
    def _run(self, sparse: bool, steps=5):
        cfg = ExperimentConfig(
            model=ModelConfig(name="fm", embedding=EmbeddingConfig(dim=8)),
            train=TrainConfig(
                batch_size=128, compute_dtype="float32", sparse_embedding=sparse,
                optimizer=OptimizerConfig(learning_rate=0.01),
            ),
        )
        trainer = Trainer(cfg, INFO)
        data = make_data()
        batch = {k: v[:128] for k, v in data.items()}
        state = trainer.init_state(batch)
        mstate = trainer.metrics.init()
        losses = []
        for i in range(steps):
            b = {k: v[(i * 128) % 512 : (i * 128) % 512 + 128] for k, v in data.items()}
            state, mstate, logs = trainer.train_step(state, trainer.device_batch(b), mstate)
            losses.append(float(logs["loss"]))
        return trainer, state, losses

    def test_sparse_matches_dense_losses(self):
        """Same seeds + same data: sparse and dense training must produce the
        same loss trajectory (identical math, different update mechanics)."""
        _, _, dense_losses = self._run(sparse=False)
        _, state, sparse_losses = self._run(sparse=True)
        np.testing.assert_allclose(sparse_losses, dense_losses, rtol=1e-4)
        assert state.tables is not None

    def test_sparse_eval_and_infer(self):
        trainer, state, _ = self._run(sparse=True, steps=3)
        data = make_data(seed=5)
        from tpurec.data.loader import ArrayLoader

        res = trainer.evaluate(state, iter(ArrayLoader(data, 128, shuffle=False)))
        assert np.isfinite(res["loss"])
        out = trainer.infer(state, {k: v[:16] for k, v in data.items()})
        assert out["output"].shape == (16,)

    def test_ffm_field_aware_sparse_matches_dense(self):
        """FieldAwareEmbedding's (V, F, D) table goes through the same sparse
        path: FFM trained sparse must track the dense loss trajectory."""
        def run(sparse):
            cfg = ExperimentConfig(
                model=ModelConfig(name="ffm", embedding=EmbeddingConfig(dim=4)),
                train=TrainConfig(
                    batch_size=128, compute_dtype="float32", sparse_embedding=sparse,
                    optimizer=OptimizerConfig(learning_rate=0.01),
                ),
            )
            trainer = Trainer(cfg, INFO)
            data = make_data()
            state = trainer.init_state({k: v[:128] for k, v in data.items()})
            mstate = trainer.metrics.init()
            losses = []
            for i in range(4):
                b = {k: v[(i * 128) % 512 : (i * 128) % 512 + 128] for k, v in data.items()}
                state, mstate, logs = trainer.train_step(
                    state, trainer.device_batch(b), mstate
                )
                losses.append(float(logs["loss"]))
            return state, losses

        _, dense_losses = run(False)
        state, sparse_losses = run(True)
        np.testing.assert_allclose(sparse_losses, dense_losses, rtol=1e-4)
        # both the shared w-table and the field-aware (V, F, D) table must be
        # in the sparse collection
        assert any(t.ndim == 3 for t in jax.tree.leaves(state.tables))

    def test_sparse_checkpoint_roundtrip(self, tmp_path):
        cfg = ExperimentConfig(
            model=ModelConfig(name="fm", embedding=EmbeddingConfig(dim=8)),
            train=TrainConfig(
                batch_size=128, compute_dtype="float32", sparse_embedding=True,
                checkpoint_dir=str(tmp_path),
            ),
        )
        trainer = Trainer(cfg, INFO)
        data = make_data()
        batch = {k: v[:128] for k, v in data.items()}
        state = trainer.init_state(batch)
        mstate = trainer.metrics.init()
        state, mstate, _ = trainer.train_step(state, trainer.device_batch(batch), mstate)
        trainer.save(state)
        restored = trainer.restore(state)
        for a, b in zip(jax.tree.leaves(state.tables), jax.tree.leaves(restored.tables)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestRowwiseAdagrad:
    def test_math_vs_dense_reference(self):
        """sparse_rowwise_adagrad on touched rows == dense row-wise Adagrad
        (numpy reference); untouched rows and accumulators unchanged."""
        from tpurec.embedding.sparse import init_sparse_adagrad, sparse_rowwise_adagrad

        rng = np.random.default_rng(2)
        table = jnp.asarray(rng.normal(size=(32, 8)).astype(np.float32))
        grad_dense = np.zeros((32, 8), np.float32)
        touched = np.array([1, 9, 17])
        grad_dense[touched] = rng.normal(size=(3, 8))
        lr, eps = 0.05, 1e-10
        # dense numpy reference
        acc = np.zeros(32, np.float32) + np.mean(grad_dense**2, axis=1)
        expect = np.asarray(table) - (
            lr / np.sqrt(acc + eps)
        )[:, None] * grad_dense
        ids = jnp.asarray(np.repeat(touched, 3))
        uniq = unique_fixed(ids, pad_id=31)
        grad_rows = jnp.asarray(grad_dense)[uniq]
        out, opt = sparse_rowwise_adagrad(
            table, init_sparse_adagrad(table), uniq, grad_rows, lr, eps
        )
        np.testing.assert_allclose(
            np.asarray(out)[touched], expect[touched], rtol=1e-5
        )
        untouched = [i for i in range(31) if i not in touched]
        np.testing.assert_array_equal(
            np.asarray(out)[untouched], np.asarray(table)[untouched]
        )
        np.testing.assert_array_equal(np.asarray(opt.acc)[untouched], 0.0)

    def test_trainer_converges_and_roundtrips(self, tmp_path):
        """FM trained with embedding_optimizer='rowwise_adagrad': loss falls,
        optimizer memory is O(V), checkpoint roundtrips the accumulator."""
        cfg = ExperimentConfig(
            model=ModelConfig(name="fm", embedding=EmbeddingConfig(dim=8)),
            train=TrainConfig(
                batch_size=128, compute_dtype="float32", sparse_embedding=True,
                checkpoint_dir=str(tmp_path),
                optimizer=OptimizerConfig(
                    learning_rate=0.1, embedding_optimizer="rowwise_adagrad"
                ),
            ),
        )
        trainer = Trainer(cfg, INFO)
        data = make_data()
        state = trainer.init_state({k: v[:128] for k, v in data.items()})
        mstate = trainer.metrics.init()
        losses = []
        for i in range(8):
            b = {k: v[(i * 128) % 512 : (i * 128) % 512 + 128] for k, v in data.items()}
            state, mstate, logs = trainer.train_step(
                state, trainer.device_batch(b), mstate
            )
            losses.append(float(logs["loss"]))
        assert np.mean(losses[-2:]) < np.mean(losses[:2])
        # O(V) accumulators: every moment leaf is 1-D
        accs = jax.tree.leaves(state.table_opt)
        tables = jax.tree.leaves(state.tables)
        assert all(a.ndim == 1 for a in accs)
        assert sum(a.size for a in accs) < sum(t.size for t in tables) / 2
        trainer.save(state)
        restored = trainer.restore(state)
        for a, b in zip(jax.tree.leaves(state.table_opt), jax.tree.leaves(restored.table_opt)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestRowwiseAdam:
    def test_math_vs_dense_reference(self):
        """sparse_rowwise_adam == numpy row-wise Adam (bf16 m storage, fp32
        per-row v) on touched rows; untouched rows/moments unchanged."""
        from tpurec.embedding.sparse import init_sparse_row_adam, sparse_rowwise_adam

        rng = np.random.default_rng(3)
        table = jnp.asarray(rng.normal(size=(32, 8)).astype(np.float32))
        grad_dense = np.zeros((32, 8), np.float32)
        touched = np.array([2, 7, 30])
        grad_dense[touched] = rng.normal(size=(3, 8))
        lr, b1, b2, eps = 0.05, 0.9, 0.999, 1e-7
        # numpy reference for step 1 (m starts at 0)
        m = (1 - b1) * grad_dense
        v = (1 - b2) * np.mean(grad_dense**2, axis=1)
        m_hat = m / (1 - b1)
        v_hat = v / (1 - b2)
        expect = np.asarray(table) - lr * m_hat / (np.sqrt(v_hat)[:, None] + eps)
        ids = jnp.asarray(np.repeat(touched, 2))
        uniq = unique_fixed(ids, pad_id=31)
        grad_rows = jnp.asarray(grad_dense)[uniq]
        out, opt = sparse_rowwise_adam(
            table, init_sparse_row_adam(table), uniq, grad_rows,
            jnp.asarray(1), lr, b1, b2, eps,
        )
        # bf16 m storage costs ~3 decimal digits — tolerance reflects it
        np.testing.assert_allclose(
            np.asarray(out)[touched], expect[touched], rtol=2e-2, atol=2e-3
        )
        untouched = [i for i in range(31) if i not in touched]
        np.testing.assert_array_equal(
            np.asarray(out)[untouched], np.asarray(table)[untouched]
        )
        assert opt.m.dtype == jnp.bfloat16 and opt.v.ndim == 1

    def test_trainer_converges_with_factored_memory(self):
        """FM with embedding_optimizer='rowwise_adam': loss falls; optimizer
        memory ≈ 0.5 table (bf16 m) + O(V) (v scalars)."""
        cfg = ExperimentConfig(
            model=ModelConfig(name="fm", embedding=EmbeddingConfig(dim=8)),
            train=TrainConfig(
                batch_size=128, compute_dtype="float32", sparse_embedding=True,
                optimizer=OptimizerConfig(
                    learning_rate=0.05, embedding_optimizer="rowwise_adam"
                ),
            ),
        )
        trainer = Trainer(cfg, INFO)
        data = make_data()
        state = trainer.init_state({k: v[:128] for k, v in data.items()})
        mstate = trainer.metrics.init()
        losses = []
        for i in range(8):
            b = {k: v[(i * 128) % 512 : (i * 128) % 512 + 128] for k, v in data.items()}
            state, mstate, logs = trainer.train_step(
                state, trainer.device_batch(b), mstate
            )
            losses.append(float(logs["loss"]))
        assert np.mean(losses[-2:]) < np.mean(losses[:2])
        table_bytes = sum(t.size * t.dtype.itemsize for t in jax.tree.leaves(state.tables))
        opt_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(state.table_opt))
        assert opt_bytes < table_bytes  # vs dense Adam's 2.0x
        # the ratio approaches 0.5 + 1/D for the real (V, D) embedding table;
        # FM's (V, 1) order-1 table dilutes the aggregate, so check per-table
        from tpurec.embedding.sparse import SparseRowAdamState

        opts = jax.tree_util.tree_leaves(
            state.table_opt,
            is_leaf=lambda x: isinstance(x, SparseRowAdamState),
        )
        for t, o in zip(jax.tree.leaves(state.tables), opts):
            if t.shape[-1] >= 8:
                ob = o.m.size * o.m.dtype.itemsize + o.v.size * o.v.dtype.itemsize
                tb = t.size * t.dtype.itemsize
                assert ob < 0.7 * tb
