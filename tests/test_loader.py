"""Loader behaviors: multi-host slicing, wrap-padded final batch + weighted
eval metrics, shuffling."""

import numpy as np
import pytest

from tpurec.config import EmbeddingConfig, ExperimentConfig, ModelConfig, TrainConfig
from tpurec.core.metrics import exact_auc
from tpurec.data.loader import ArrayLoader
from tpurec.data.schema import DataInfo
from tpurec.train import Trainer

INFO = DataInfo.from_dims(["a", "b"], [10, 10])


def make_data(n, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "a": rng.integers(0, 10, n),
        "b": rng.integers(10, 20, n),
        "label": rng.integers(0, 2, n).astype(np.float32),
    }


class TestMultiHost:
    def test_hosts_partition_rows_disjointly(self):
        data = make_data(100)
        seen = []
        for host in range(4):
            loader = ArrayLoader(
                data, 10, shuffle=False, drop_remainder=False, host_id=host, num_hosts=4
            )
            for batch in loader:
                seen.extend(batch["a"].tolist() and [])
                seen.extend((batch["b"] * 0).tolist())
        # each host sees n/4 rows; 4 hosts cover all rows exactly once
        counts = [ArrayLoader(data, 10, host_id=h, num_hosts=4).n for h in range(4)]
        assert sum(counts) == 100
        rows = set()
        for h in range(4):
            l = ArrayLoader(data, 100, shuffle=False, drop_remainder=False, host_id=h, num_hosts=4)
            for b in l:
                rows.update(zip(b["a"].tolist(), b["b"].tolist(), b["label"].tolist(),
                                np.arange(h, 100, 4)[: len(b["a"])].tolist()))
        assert len(rows) == 100


class TestPadFinal:
    def test_final_batch_padded_with_weights(self):
        data = make_data(25)
        loader = ArrayLoader(data, 10, shuffle=False, pad_final=True)
        batches = list(loader)
        assert len(batches) == 3
        assert all(len(b["a"]) == 10 for b in batches)
        assert "__weight__" in batches[-1]
        np.testing.assert_array_equal(batches[-1]["__weight__"], [1] * 5 + [0] * 5)
        assert "__weight__" in batches[0]
        np.testing.assert_array_equal(batches[0]["__weight__"], [1] * 10)

    def test_weighted_eval_auc_is_exact(self):
        """Eval with wrap-padding must equal the exact AUC over ALL examples
        (drop_remainder eval loses the tail)."""
        rng = np.random.default_rng(1)
        n = 203  # awkward size
        data = make_data(n, seed=1)
        cfg = ExperimentConfig(
            model=ModelConfig(name="fm", embedding=EmbeddingConfig(dim=4)),
            train=TrainConfig(batch_size=64, compute_dtype="float32"),
        )
        trainer = Trainer(cfg, INFO)
        state = trainer.init_state({k: v[:64] for k, v in data.items()})
        res = trainer.evaluate(
            state, iter(ArrayLoader(data, 64, shuffle=False, pad_final=True))
        )
        # exact oracle over the full set
        preds = np.concatenate(
            [
                trainer.infer(state, {k: v[i : i + 64] for k, v in data.items()})["output"]
                for i in range(0, n, 64)
            ]
        )
        want = exact_auc(data["label"], preds)
        assert res["auc"] == pytest.approx(want, abs=2e-3)


def test_shuffle_changes_each_epoch():
    data = make_data(50)
    loader = ArrayLoader(data, 50, shuffle=True, seed=3)
    e1 = next(iter(loader))["a"].tolist()
    e2 = next(iter(loader))["a"].tolist()
    assert e1 != e2
    assert sorted(e1) == sorted(e2)
