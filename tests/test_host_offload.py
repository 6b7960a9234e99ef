"""Host-offloaded Adam moments (embedding/host_offload.py): math parity with
the device sparse_adam, end-to-end trainer equivalence against the
device-moment 'adam' sparse mode, zero device moment memory, and the
checkpoint sidecar round-trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurec.config import (
    EmbeddingConfig,
    ExperimentConfig,
    MeshConfig,
    ModelConfig,
    OptimizerConfig,
    TrainConfig,
)
from tpurec.data.schema import DataInfo
from tpurec.embedding.host_offload import HostAdamState, HostAdamStore
from tpurec.embedding.modules import set_sparse_mode
from tpurec.embedding.sparse import init_sparse_adam, sparse_adam
from tpurec.train import Trainer

INFO = DataInfo.from_dims(["ua", "ub", "ia", "ib"], [11, 7, 13, 5])


@pytest.fixture(autouse=True)
def _reset_sparse_mode():
    yield
    set_sparse_mode(False)


def make_data(n=512, seed=0):
    rng = np.random.default_rng(seed)
    data = {
        name: rng.integers(off, off + dim, size=(n,))
        for name, off, dim in zip(
            INFO.feature_names, INFO.feature_offsets, INFO.feature_dims
        )
    }
    data["label"] = rng.integers(0, 2, n).astype(np.float32)
    return data


def _single_device_trainer(cfg):
    from tpurec.core.mesh import make_mesh

    return Trainer(
        cfg, INFO, mesh_ctx=make_mesh(cfg.mesh, devices=jax.devices()[:1])
    )


def _config(embedding_optimizer, epochs=2):
    return ExperimentConfig(
        model=ModelConfig(name="fm", embedding=EmbeddingConfig(dim=8)),
        train=TrainConfig(
            batch_size=128,
            epochs=epochs,
            log_every_steps=0,
            compute_dtype="float32",
            sparse_embedding=True,
            optimizer=OptimizerConfig(
                learning_rate=0.01, embedding_optimizer=embedding_optimizer
            ),
        ),
        mesh=MeshConfig(data=1, model=1),  # host_adam is single-device
    )


class TestHostStoreMath:
    def test_matches_device_sparse_adam(self):
        """Same lazy-Adam math as the all-device implementation, over several
        steps (moments accumulate host-side between calls)."""
        rng = np.random.default_rng(0)
        v, d = 40, 8
        table_h = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
        table_d = table_h
        store = HostAdamStore()
        state_h = HostAdamState(jnp.int32(store.register((v, d))))
        state_d = init_sparse_adam(table_d)
        update = jax.jit(
            lambda t, s, u, g, step: store.update(t, s, u, g, step, 0.01)
        )
        for step in range(1, 5):
            uniq = jnp.asarray(
                np.sort(rng.choice(v - 1, size=10, replace=False))
            )
            g = jnp.asarray(rng.normal(size=(10, d)).astype(np.float32))
            table_h, state_h = update(table_h, state_h, uniq, g, jnp.int32(step))
            table_d, state_d = sparse_adam(
                table_d, state_d, uniq, g, jnp.int32(step), 0.01
            )
            np.testing.assert_allclose(
                np.asarray(table_h), np.asarray(table_d), rtol=1e-5, atol=1e-6
            )
        np.testing.assert_allclose(
            store._m[0], np.asarray(state_d.m), rtol=1e-5, atol=1e-7
        )
        np.testing.assert_allclose(
            store._v[0], np.asarray(state_d.v), rtol=1e-5, atol=1e-7
        )

    def test_state_dict_roundtrip(self, tmp_path):
        store = HostAdamStore()
        store.register((6, 4))
        store._m[0][:] = 1.5
        store._v[0][:] = 2.5
        path = str(tmp_path / "moments.npz")
        store.save(path)
        other = HostAdamStore()
        other.load(path)
        np.testing.assert_array_equal(other._m[0], store._m[0])
        np.testing.assert_array_equal(other._v[0], store._v[0])


class TestTrainerHostAdam:
    def test_matches_device_adam_end_to_end(self):
        """Training with host_adam produces the same parameters and tables as
        the device-moment 'adam' sparse mode (identical math, different
        moment placement)."""
        data = make_data()
        from tpurec.data.loader import ArrayLoader

        results = {}
        for opt in ("adam", "host_adam"):
            trainer = _single_device_trainer(_config(opt))
            loader = ArrayLoader(data, 128, seed=0)
            state, _ = trainer.run(lambda: iter(loader), lambda: iter(loader))
            results[opt] = jax.device_get(
                {"params": state.params, "tables": state.tables}
            )
            if opt == "host_adam":
                assert trainer.host_store is not None
                assert trainer.host_store.num_tables >= 1
                # ZERO device memory for moments: the only table_opt leaves
                # are scalar slot indices
                leaves = jax.tree.leaves(state.table_opt)
                assert all(np.asarray(l).ndim == 0 for l in leaves)
        flat_a = jax.tree.leaves(results["adam"])
        flat_h = jax.tree.leaves(results["host_adam"])
        for a, h in zip(flat_a, flat_h):
            np.testing.assert_allclose(a, h, rtol=2e-4, atol=2e-5)

    def test_checkpoint_sidecar_roundtrip(self, tmp_path):
        """save() writes host_moments_<step>.npz; restore() reloads it so
        resumed training continues from identical optimizer state."""
        data = make_data(n=256)
        from tpurec.data.loader import ArrayLoader

        cfg = _config("host_adam", epochs=1).replace(
            train=_config("host_adam", epochs=1).train.replace(
                checkpoint_dir=str(tmp_path / "ckpt")
            )
        )
        trainer = _single_device_trainer(cfg)
        loader = ArrayLoader(data, 128, seed=0)
        state, _ = trainer.run(lambda: iter(loader), lambda: iter(loader))
        trainer.save(state)
        step = int(state.step)
        sidecar = os.path.join(trainer.ckpt.directory, f"host_moments_{step}.npz")
        assert os.path.exists(sidecar)
        m_before = [a.copy() for a in trainer.host_store._m]

        trainer2 = _single_device_trainer(cfg)
        fresh = trainer2.init_state({k: v[:4] for k, v in data.items()})
        restored = trainer2.restore(fresh)
        assert int(restored.step) == step
        for a, b in zip(m_before, trainer2.host_store._m):
            np.testing.assert_array_equal(a, b)

    def test_multi_device_mesh_rejected(self):
        if jax.device_count() < 2:
            pytest.skip("needs >1 device")
        cfg = _config("host_adam").replace(mesh=MeshConfig(data=-1, model=1))
        trainer = Trainer(cfg, INFO)
        data = make_data(n=8)
        with pytest.raises(ValueError, match="host_adam"):
            trainer.init_state(data)
