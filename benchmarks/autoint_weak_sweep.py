"""autoint_weak hyperparameter sweep (VERDICT r3 item #9).

Target: eval AUC >= 0.5972 (the reference 3.DCN `model/` run's best —
3.DCN/ModelManager.py:371-373 comment attributes it to AutoInt) on the same
weak-signal regime as fm_weak (make_dcn_raw; full-score oracle ~0.6134).
Round-3 recipe (lr 2e-3, used_l2 1e-3, 2 layers, 2 heads, d16) reached
0.5937 — this sweeps heads/depth/L2-style/lr-schedule around it.

Writes benchmarks/autoint_weak_sweep.json incrementally.
Usage: python benchmarks/autoint_weak_sweep.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "autoint_weak_sweep.json")


def run_one(info, train, test, *, lr, batch, dim, epochs, used_l2=0.0,
            emb_l2=-1.0, l2_w=-1.0, layers=2, heads=2, head_dim=8,
            schedule="", trials=5):
    from tpurec.config import (
        EarlyStopConfig,
        EmbeddingConfig,
        ExperimentConfig,
        ModelConfig,
        OptimizerConfig,
        TrainConfig,
    )
    from tpurec.data.loader import ArrayLoader
    from tpurec.train import Trainer

    cfg = ExperimentConfig(
        model=ModelConfig(
            name="autoint",
            params={
                "num_attention_layers": layers,
                "num_heads": heads,
                "head_dim": head_dim,
            },
            embedding=EmbeddingConfig(dim=dim, used_id_l2=used_l2),
        ),
        train=TrainConfig(
            batch_size=batch,
            epochs=epochs,
            log_every_steps=0,
            loss="bce",
            optimizer=OptimizerConfig(
                learning_rate=lr,
                embedding_l2=max(emb_l2, 0.0),
                embedding_l2_order1=l2_w,
                lr_schedule=schedule,
                schedule_steps=(epochs * (480_000 // batch)) if schedule else 0,
            ),
            early_stop=EarlyStopConfig(num_trials=trials),
        ),
    )
    trainer = Trainer(cfg, info)
    t0 = time.time()
    _, report = trainer.run(
        lambda: iter(ArrayLoader(train, batch, seed=1)),
        lambda: iter(ArrayLoader(test, batch, shuffle=False)),
    )
    return {
        "eval_auc": report["best_eval"]["auc"],
        "best_epoch": report["best_epoch"],
        "seconds": round(time.time() - t0, 1),
        "history": [round(h["eval"]["auc"], 5) for h in report["history"]],
    }


def main():
    import tempfile

    from tpurec.data.generators import RankingTableGenerator
    from tpurec.data.loader import load_columnar, shard_paths
    from tpurec.data.synthetic import make_dcn_raw

    root = tempfile.mkdtemp(prefix="aiweak_")
    raw = make_dcn_raw(os.path.join(root, "raw"), n_events=600_000)
    orc = np.load(raw["oracle_path"])
    info = RankingTableGenerator(os.path.join(root, "gen"), raw["main_path"]).run_all()
    train = load_columnar(shard_paths(os.path.join(root, "gen"), "train"))
    test = load_columnar(shard_paths(os.path.join(root, "gen"), "test"))
    results = {}
    if os.path.exists(OUT):
        try:
            with open(OUT) as f:
                results = json.load(f)
        except Exception:
            pass
    results["_oracles"] = {
        "oracle_auc": float(orc["oracle_auc"]),
        "cat_only_auc": float(orc["cat_only_auc"]),
        "target": 0.5972,
        "r3_recipe_auc": 0.5937,
    }
    configs = [
        # r3 recipe re-baselined at this sweep's epoch budget
        dict(lr=2e-3, batch=512, dim=16, epochs=24, used_l2=1e-3),
        # the fm_weak lesson: coupled full-table L2 split by order beat
        # used-id L2 decisively there — port the winning strengths
        dict(lr=1e-3, batch=256, dim=16, epochs=20, emb_l2=3e-4, l2_w=4e-5),
        dict(lr=1e-3, batch=256, dim=16, epochs=20, emb_l2=3e-4, l2_w=4e-5,
             schedule="cosine"),
        # capacity axis: deeper/wider attention vs the small-signal regime
        dict(lr=2e-3, batch=512, dim=16, epochs=24, used_l2=1e-3, layers=3),
        dict(lr=2e-3, batch=512, dim=16, epochs=24, used_l2=1e-3, heads=4,
             head_dim=4),
        dict(lr=1e-3, batch=256, dim=8, epochs=20, emb_l2=3e-4, l2_w=4e-5),
        # lr schedule on the r3 recipe
        dict(lr=2e-3, batch=512, dim=16, epochs=24, used_l2=1e-3,
             schedule="cosine"),
    ]
    for c in configs:
        key = (
            f"lr{c['lr']}_b{c['batch']}_d{c['dim']}_e{c['epochs']}"
            + (f"_ul{c['used_l2']}" if c.get("used_l2", 0.0) > 0 else "")
            + (f"_l2{c['emb_l2']}" if c.get("emb_l2", -1.0) >= 0 else "")
            + (f"_lw{c['l2_w']}" if c.get("l2_w", -1.0) >= 0 else "")
            + (f"_L{c['layers']}" if c.get("layers", 2) != 2 else "")
            + (f"_h{c['heads']}x{c.get('head_dim', 8)}" if c.get("heads", 2) != 2 else "")
            + (f"_{c['schedule']}" if c.get("schedule") else "")
        )
        if key in results:
            print(f"skip {key} (done)", flush=True)
            continue
        print(f"running {key}", flush=True)
        results[key] = run_one(info, train, test, **c)
        print(json.dumps({key: results[key]}), flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
