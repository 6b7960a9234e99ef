import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurec.config import ExperimentConfig, MeshConfig, TrainConfig
from tpurec.core.early_stop import EarlyStopper
from tpurec.core.mesh import make_mesh
from tpurec.core.metrics import AUC, Mean, MetricBundle, exact_auc


class TestConfig:
    def test_roundtrip(self):
        cfg = ExperimentConfig()
        cfg2 = ExperimentConfig.from_json(cfg.to_json())
        assert cfg == cfg2

    def test_nested_from_dict(self):
        cfg = ExperimentConfig.from_dict(
            {"train": {"batch_size": 64, "optimizer": {"learning_rate": 0.01}}}
        )
        assert cfg.train.batch_size == 64
        assert cfg.train.optimizer.learning_rate == 0.01

    def test_unknown_field_raises(self):
        with pytest.raises(KeyError):
            TrainConfig.from_dict({"nope": 1})


class TestMesh:
    def test_default_mesh_uses_all_devices(self):
        ctx = make_mesh()
        assert ctx.n_devices == len(jax.devices())
        assert ctx.n_model == 1

    def test_2d_mesh(self):
        ctx = make_mesh(MeshConfig(data=4, model=2))
        assert ctx.n_data == 4 and ctx.n_model == 2
        assert ctx.table_rows.spec == jax.sharding.PartitionSpec("model", None)

    def test_bad_shape_raises(self):
        with pytest.raises(ValueError):
            make_mesh(MeshConfig(data=3, model=2))


class TestAUC:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_exact_auc(self, seed):
        rng = np.random.default_rng(seed)
        n = 20_000
        y = (rng.random(n) < 0.3).astype(np.float32)
        # correlated predictions
        p = np.clip(0.25 * y + 0.5 * rng.random(n), 0.0, 1.0).astype(np.float32)
        metric = AUC(num_buckets=4096)
        state = metric.init()
        # stream in chunks
        for i in range(0, n, 4096):
            state = metric.update(state, jnp.array(y[i : i + 4096]), jnp.array(p[i : i + 4096]))
        got = float(metric.result(state))
        want = exact_auc(y, p)
        assert abs(got - want) < 2e-3

    def test_matches_sklearn(self):
        sklearn = pytest.importorskip("sklearn.metrics")
        rng = np.random.default_rng(7)
        y = (rng.random(5000) < 0.5).astype(np.float32)
        p = np.clip(y * 0.3 + rng.random(5000) * 0.7, 0, 1).astype(np.float32)
        metric = AUC(num_buckets=8192)
        state = metric.update(metric.init(), jnp.array(y), jnp.array(p))
        assert abs(float(metric.result(state)) - sklearn.roc_auc_score(y, p)) < 2e-3

    def test_degenerate_all_one_class(self):
        metric = AUC()
        state = metric.update(metric.init(), jnp.ones(10), jnp.linspace(0, 1, 10))
        assert float(metric.result(state)) == 0.0

    def test_jittable(self):
        metric = AUC(num_buckets=256)

        @jax.jit
        def step(state, y, p):
            return metric.update(state, y, p)

        state = step(metric.init(), jnp.array([1.0, 0.0]), jnp.array([0.9, 0.1]))
        assert float(metric.result(state)) == 1.0


class TestMean:
    def test_weighted(self):
        m = Mean()
        s = m.update(m.init(), jnp.array([1.0, 3.0]), jnp.array([1.0, 3.0]))
        assert float(m.result(s)) == pytest.approx(2.5)


class TestMetricBundle:
    def test_update_and_result(self):
        b = MetricBundle({"auc": AUC(num_buckets=256), "loss": Mean()})
        s = b.init()
        s = b.update(
            s,
            auc=(jnp.array([1.0, 0.0]), jnp.array([0.8, 0.2])),
            loss=(jnp.array(0.5),),
        )
        out = b.result(s)
        assert float(out["auc"]) == 1.0
        assert float(out["loss"]) == 0.5


class TestEarlyStopper:
    def test_best_criterion(self):
        es = EarlyStopper(num_trials=2, criterion="best")
        assert es.is_continuable(0.5)
        assert es.is_continuable(0.6)  # new best
        assert es.is_continuable(0.55)  # trial 1
        assert not es.is_continuable(0.58)  # trial 2 → stop
        best_epoch, history = es.check_record()
        assert best_epoch == 1
        assert history == [0.5, 0.6, 0.55, 0.58]

    def test_better_criterion(self):
        es = EarlyStopper(num_trials=2, criterion="better")
        assert es.is_continuable(0.5)
        assert es.is_continuable(0.4)  # worse than prev: trial 1
        assert es.is_continuable(0.45)  # better than prev: reset
        assert es.is_continuable(0.44)  # trial 1
        assert not es.is_continuable(0.43)  # trial 2 → stop

    def test_min_mode(self):
        es = EarlyStopper(num_trials=1, criterion="best", mode="min")
        assert es.is_continuable(1.0)
        assert es.is_continuable(0.5)
        assert not es.is_continuable(0.7)
