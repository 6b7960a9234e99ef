import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn
from jax.sharding import NamedSharding, PartitionSpec as P

from tpurec.config import MeshConfig
from tpurec.core.mesh import make_mesh
from tpurec.data.schema import DataInfo, FeatureEncoder
from tpurec.embedding import (
    FieldAwareEmbedding,
    LinearEmbedding,
    SharedEmbedding,
    row_sharded_lookup,
    used_id_l2,
)
from tpurec.embedding.modules import stack_features


@pytest.fixture(scope="module")
def mesh_ctx():
    return make_mesh(MeshConfig(data=4, model=2))


class TestShardedLookup:
    def test_matches_dense_take(self, mesh_ctx):
        rng = np.random.default_rng(0)
        table = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
        ids = jnp.asarray(rng.integers(0, 64, size=(8, 5)))
        table_s = jax.device_put(table, mesh_ctx.table_rows)
        ids_s = jax.device_put(ids, mesh_ctx.batch)
        got = row_sharded_lookup(table_s, ids_s, mesh_ctx.mesh)
        np.testing.assert_allclose(np.asarray(got), np.asarray(jnp.take(table, ids, axis=0)), rtol=1e-6)

    def test_under_jit(self, mesh_ctx):
        table = jnp.arange(64 * 4, dtype=jnp.float32).reshape(64, 4)
        ids = jnp.asarray(np.arange(16).reshape(8, 2) % 64)

        @jax.jit
        def f(t, i):
            return row_sharded_lookup(t, i, mesh_ctx.mesh)

        t = jax.device_put(table, mesh_ctx.table_rows)
        i = jax.device_put(ids, mesh_ctx.batch)
        np.testing.assert_allclose(np.asarray(f(t, i)), np.asarray(jnp.take(table, ids, axis=0)))

    def test_gradient_matches_dense(self, mesh_ctx):
        rng = np.random.default_rng(1)
        table = jnp.asarray(rng.normal(size=(32, 8)).astype(np.float32))
        ids = jnp.asarray(rng.integers(0, 32, size=(8, 3)))
        cot = jnp.asarray(rng.normal(size=(8, 3, 8)).astype(np.float32))

        def loss_sharded(t):
            t = jax.lax.with_sharding_constraint(t, mesh_ctx.table_rows)
            return jnp.sum(row_sharded_lookup(t, ids, mesh_ctx.mesh) * cot)

        def loss_dense(t):
            return jnp.sum(jnp.take(t, ids, axis=0) * cot)

        g1 = jax.jit(jax.grad(loss_sharded))(table)
        g2 = jax.grad(loss_dense)(table)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-6)

    def test_uneven_vocab_raises(self, mesh_ctx):
        table = jnp.zeros((63, 4))
        with pytest.raises(ValueError):
            row_sharded_lookup(table, jnp.zeros((4,), jnp.int32), mesh_ctx.mesh)


class TestUsedIdL2:
    def test_matches_naive_unique(self):
        rng = np.random.default_rng(2)
        table = jnp.asarray(rng.normal(size=(100, 6)).astype(np.float32))
        ids = jnp.asarray(rng.integers(0, 100, size=(32, 4)))
        got = float(used_id_l2(table, ids))
        uniq = np.unique(np.asarray(ids).reshape(-1))
        want = 0.5 * float(np.sum(np.asarray(table)[uniq] ** 2))
        assert got == pytest.approx(want, rel=1e-5)

    def test_grad_only_touches_used_rows(self):
        table = jnp.ones((10, 3))
        ids = jnp.asarray([1, 1, 4])
        g = jax.grad(lambda t: used_id_l2(t, ids))(table)
        g = np.asarray(g)
        assert np.all(g[[1, 4]] == 1.0)
        assert np.all(g[[0, 2, 3, 5, 6, 7, 8, 9]] == 0.0)


class TestModules:
    def test_shared_embedding_forward_and_specs(self, mesh_ctx):
        mod = SharedEmbedding(vocab_size=50, dim=8, mesh=mesh_ctx.mesh)
        ids = jnp.asarray(np.arange(12).reshape(4, 3))
        variables = mod.init(jax.random.key(0), ids)
        out = mod.apply(variables, ids)
        assert out.shape == (4, 3, 8)
        specs = nn.get_partition_spec(variables)
        assert specs["params"]["embedding"] == P("model", None)
        # vocab padded to a multiple of n_model*8 = 16
        table = variables["params"]["embedding"].value
        assert table.shape[0] % 16 == 0 and table.shape[0] >= 50
        assert float(jnp.max(jnp.abs(table))) <= 0.05

    def test_shard_map_strategy_matches_gspmd(self, mesh_ctx):
        ids = jnp.asarray(np.arange(8).reshape(8, 1))
        m1 = SharedEmbedding(vocab_size=32, dim=4, mesh=mesh_ctx.mesh, strategy="gspmd")
        m2 = SharedEmbedding(vocab_size=32, dim=4, mesh=mesh_ctx.mesh, strategy="shard_map")
        v = m1.init(jax.random.key(1), ids)
        o1 = m1.apply(v, ids)
        o2 = m2.apply(v, jax.device_put(ids, mesh_ctx.batch))
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-6)

    def test_linear_embedding(self):
        mod = LinearEmbedding(vocab_size=20)
        ids = jnp.asarray([[1, 2], [3, 4]])
        v = mod.init(jax.random.key(0), ids)
        assert mod.apply(v, ids).shape == (2, 2)

    def test_field_aware_embedding(self):
        mod = FieldAwareEmbedding(vocab_size=20, num_fields=3, dim=4)
        ids = jnp.asarray([[1, 2, 3]])
        v = mod.init(jax.random.key(0), ids)
        assert mod.apply(v, ids).shape == (1, 3, 3, 4)

    def test_bfloat16_compute(self):
        mod = SharedEmbedding(vocab_size=16, dim=4, dtype=jnp.bfloat16)
        ids = jnp.asarray([0, 1])
        v = mod.init(jax.random.key(0), ids)
        out = mod.apply(v, ids)
        assert out.dtype == jnp.bfloat16
        assert v["params"]["embedding"].value.dtype == jnp.float32


class TestSchema:
    def test_encoder_offsets(self):
        enc = FeatureEncoder(["a", "b"])
        info = enc.fit({"a": ["x", "y", "x"], "b": [1, 2, 3]})
        assert info.feature_dims == [2, 3]
        assert info.feature_offsets == [0, 2]
        assert info.total_dims == 5
        assert enc.encode("a", "x") == 0
        assert enc.encode("b", 1) == 2  # offset by dim of 'a'

    def test_save_load_roundtrip(self, tmp_path):
        enc = FeatureEncoder(["a", "b"])
        info = enc.fit({"a": ["x", "y"], "b": ["p", "q", "r"]})
        info.save(str(tmp_path))
        enc.save(str(tmp_path))
        info2 = DataInfo.load(str(tmp_path))
        assert info2.feature_dims == info.feature_dims
        assert info2.feature_offsets == info.feature_offsets
        enc2 = FeatureEncoder.load(str(tmp_path))
        assert enc2.recorder == enc.recorder
        # bare reference-triple fallback
        import os

        os.remove(str(tmp_path / "schema.json"))
        info3 = DataInfo.load(str(tmp_path))
        assert info3.total_dims == info.total_dims

    def test_stack_features(self):
        out = stack_features(
            {"a": jnp.asarray([1, 2]), "b": jnp.asarray([3, 4])}, ["a", "b"]
        )
        np.testing.assert_array_equal(np.asarray(out), [[1, 3], [2, 4]])
