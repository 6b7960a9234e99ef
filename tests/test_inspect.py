"""Inspection utilities over a real mini-pipeline."""

import numpy as np

from tpurec.config import EmbeddingConfig, ExperimentConfig, ModelConfig, TrainConfig
from tpurec.data.generators import TabularDataGenerator
from tpurec.data.inspect import (
    check_inference,
    check_tf_record,
    get_kv_value,
    summarize_dataset,
)
from tpurec.data.loader import ArrayLoader, load_columnar, shard_paths
from tpurec.data.synthetic import make_ecommerce_raw
from tpurec.serving import DictKVStore
from tpurec.train import Trainer


def test_inspect_roundtrip(tmp_path):
    raw = make_ecommerce_raw(str(tmp_path / "raw"), n_users=100, n_items=60, n_events=3000)
    gen = TabularDataGenerator(
        output_path=str(tmp_path / "gen"),
        item_path=raw["item_path"],
        user_path=raw["user_path"],
        main_path=raw["main_path"],
    )
    info = gen.run_all()
    out = str(tmp_path / "gen")
    # shard peek
    shard = shard_paths(out, "train")[0]
    records = check_tf_record(shard, 2)
    assert len(records) == 2
    assert "label" in records[0] and "user_tag1" in records[0]
    # dataset card
    card = summarize_dataset(out)
    assert card["total_ids"] == info.total_dims
    assert card["train_records"] > card["test_records"] > 0
    # train 1 epoch, export, check inference
    cfg = ExperimentConfig(
        model=ModelConfig(name="fm", embedding=EmbeddingConfig(dim=4)),
        train=TrainConfig(batch_size=128, epochs=1, log_every_steps=0, compute_dtype="float32"),
    )
    trainer = Trainer(cfg, info)
    train = load_columnar(shard_paths(out, "train"))
    state, _ = trainer.run(
        lambda: iter(ArrayLoader(train, 128)), lambda: iter(ArrayLoader(train, 128, shuffle=False))
    )
    trainer.export(state, str(tmp_path / "export"))
    result = check_inference(str(tmp_path / "export"), out)
    assert result["output"].shape == (4,)
    assert np.all(np.isfinite(result["output"]))
    # kv value reader
    kv = DictKVStore(str(tmp_path / "kv.json"))
    kv.set("DSSM_u1", "i1,i2\t0.9,0.8")
    kv.save()
    assert get_kv_value(str(tmp_path / "kv.json"), "DSSM_u1").startswith("i1,i2")
