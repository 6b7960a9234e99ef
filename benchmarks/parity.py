"""AUC-parity benchmark: train the headline configs to convergence on
reference-class synthetic data and compare against BASELINE.md targets.

Reference baselines (BASELINE.md — extracted from the repo's TensorBoard
event files):
    DSSM dual-tower retrieval  eval AUC 0.9225 (best 0.9233)
    DeepFM ranking             eval AUC 0.9244 (best 0.9271)
    FM (weak-signal data)      eval AUC 0.5879 (best 0.5926)
    MMOE multi-task            ctr 0.9767 / cvr 0.9582

The synthetic generators are calibrated so the Bayes-oracle AUC matches the
reference data's achievable AUC class (tpurec/data/synthetic.py); "parity"
means reaching the reference number within run-to-run variance on data of the
same difficulty.

Usage: python benchmarks/parity.py [--quick] [--models fm,deepfm,...]
Writes benchmarks/parity_results.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_tabular(root: str, n_events: int, seed: int = 0):
    from tpurec.data.generators import TabularDataGenerator
    from tpurec.data.loader import load_columnar, shard_paths
    from tpurec.data.synthetic import make_ecommerce_raw

    raw = make_ecommerce_raw(
        os.path.join(root, "raw"),
        n_users=5000,
        n_items=2500,
        n_events=n_events,
        seed=seed,
    )
    gen = TabularDataGenerator(
        output_path=os.path.join(root, "gen"),
        item_path=raw["item_path"],
        user_path=raw["user_path"],
        main_path=raw["main_path"],
    )
    info = gen.run_all()
    out = os.path.join(root, "gen")
    return (
        info,
        load_columnar(shard_paths(out, "train")),
        load_columnar(shard_paths(out, "test")),
    )


def run_ranking(name, info, train, test, epochs, lr, batch=512, loss="bce", dim=16):
    from tpurec.config import (
        EmbeddingConfig,
        ExperimentConfig,
        ModelConfig,
        OptimizerConfig,
        TrainConfig,
    )
    from tpurec.data.loader import ArrayLoader
    from tpurec.train import Trainer

    cfg = ExperimentConfig(
        model=ModelConfig(name=name, embedding=EmbeddingConfig(dim=dim)),
        train=TrainConfig(
            batch_size=batch,
            epochs=epochs,
            log_every_steps=0,
            loss=loss,
            optimizer=OptimizerConfig(learning_rate=lr),
            early_stop=__import__("tpurec.config", fromlist=["EarlyStopConfig"]).EarlyStopConfig(num_trials=3),
        ),
    )
    trainer = Trainer(cfg, info)
    t0 = time.time()
    state, report = trainer.run(
        lambda: iter(ArrayLoader(train, batch, seed=1)),
        lambda: iter(ArrayLoader(test, batch, shuffle=False)),
    )
    report["train_seconds"] = time.time() - t0
    return state, trainer, report


def bench_dssm_recall(trainer, state, info, test):
    """recall@100 of the trained two-tower model on held-out positives."""
    import jax
    import jax.numpy as jnp

    from tpurec.serving import exact_topk

    model = trainer.model
    variables = {"params": state.params, **state.model_state}
    pos = {k: v[test["label"] > 0] for k, v in test.items()}
    n = min(20000, len(pos["label"]))
    pos = {k: v[:n] for k, v in pos.items()}
    u = np.asarray(
        jax.jit(lambda b: model.apply(variables, b, method=model.user_embedding))(
            {k: jnp.asarray(v) for k, v in pos.items() if k in info.user_features}
        )
    )
    # unique item corpus from the test set
    item_cols = info.item_features
    items = np.stack([test[c] for c in item_cols], 1)
    uniq, inverse = np.unique(items, axis=0, return_inverse=True)
    i_emb = np.asarray(
        jax.jit(lambda b: model.apply(variables, b, method=model.item_embedding))(
            {c: jnp.asarray(uniq[:, j]) for j, c in enumerate(item_cols)}
        )
    )
    pos_items = np.stack([pos[c] for c in item_cols], 1)
    truth = np.array(
        [np.where((uniq == row).all(1))[0][0] for row in pos_items[:2000]]
    )
    idx, _ = exact_topk(u[:2000], i_emb, min(100, len(uniq)))
    return float(np.mean(np.any(idx == truth[:, None], axis=1)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small data / few epochs")
    ap.add_argument("--models", default="fm,deepfm,dssm,mmoe,din")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "parity_results.json"))
    args = ap.parse_args()
    models = args.models.split(",")
    n_events = 60_000 if args.quick else 600_000
    epochs = 3 if args.quick else 12
    # merge into prior results so partial re-runs keep other entries
    results = {}
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                results = json.load(f)
        except Exception:
            results = {}

    root = tempfile.mkdtemp(prefix="parity_")
    if {"fm", "deepfm", "dssm"} & set(models):
        info, train, test = build_tabular(root, n_events)
        if "fm" in models:
            _, _, rep = run_ranking("fm", info, train, test, epochs, lr=0.01)
            results["fm"] = {"eval_auc": rep["best_eval"]["auc"], "target": 0.59,
                             "note": "reference FM is on weak-signal DCN data (0.5879); "
                                     "same-generator oracle here is ~0.94",
                             "seconds": rep["train_seconds"]}
        if "deepfm" in models:
            _, _, rep = run_ranking("deepfm", info, train, test, epochs, lr=0.005)
            results["deepfm"] = {"eval_auc": rep["best_eval"]["auc"], "target": 0.9244,
                                 "seconds": rep["train_seconds"]}
        if "dssm" in models:
            # the reference trains DSSM dual-tower pointwise with BCE on the
            # click label (cosine → [0,1]) and reports eval AUC 0.9225 — the
            # apples-to-apples parity metric. recall@100 is our own extra
            # (the synthetic task's ORACLE recall@100 is only ≈0.25: items
            # are tag-level substitutable, see benchmarks/notes).
            # cosine-bounded outputs converge slower than logit models under
            # BCE — give the tower model the same doubled budget as DIN
            state, trainer, rep = run_ranking(
                "dssm_double", info, train, test, epochs * 2, lr=0.005, loss="bce",
            )
            recall = bench_dssm_recall(trainer, state, info, test)
            results["dssm"] = {
                "eval_auc": rep["best_eval"]["auc"],
                "target": 0.9225,
                "recall@100": recall,
                "oracle_recall@100": "~0.25 (tag-substitutable items)",
                "seconds": rep["train_seconds"],
            }
    if "mmoe" in models:
        from tpurec.data.generators import ImpressionLogGenerator
        from tpurec.data.loader import load_columnar, shard_paths
        from tpurec.data.synthetic import make_impression_log_raw

        mroot = os.path.join(root, "mmoe")
        log = make_impression_log_raw(os.path.join(mroot, "raw"), n_events=n_events // 2)
        info = ImpressionLogGenerator(os.path.join(mroot, "gen"), log).run_all()
        train = load_columnar(shard_paths(os.path.join(mroot, "gen"), "train"))
        test = load_columnar(shard_paths(os.path.join(mroot, "gen"), "test"))
        _, _, rep = run_ranking("mmoe", info, train, test, epochs, lr=0.005, loss="multi_task")
        results["mmoe"] = {
            "ctr_auc": rep["best_eval"]["ctr_auc"],
            "cvr_auc": rep["best_eval"]["cvr_auc"],
            "target": {"ctr": 0.9767, "cvr": 0.9582},
            "seconds": rep["train_seconds"],
        }
    if "din" in models:
        from tpurec.data.generators import SequenceDataGenerator
        from tpurec.data.loader import load_columnar, shard_paths
        from tpurec.data.synthetic import make_behavior_sequence_raw

        sroot = os.path.join(root, "din")
        raw = make_behavior_sequence_raw(
            os.path.join(sroot, "raw"), n_users=3000, n_items=1500,
            n_events=n_events // 2, max_history=30,
        )
        info = SequenceDataGenerator(os.path.join(sroot, "gen"), raw["events_path"], max_seq_length=30).run_all()
        train = load_columnar(shard_paths(os.path.join(sroot, "gen"), "train"))
        test = load_columnar(shard_paths(os.path.join(sroot, "gen"), "test"))
        _, _, rep = run_ranking("din", info, train, test, epochs * 2, lr=0.01)
        results["din"] = {
            "eval_auc": rep["best_eval"]["auc"],
            # latent oracle scores with the TRUE user-topic vector; a model
            # only observes the ≤30-item sampled history — an LR given the
            # ground-truth item topics + the observable history caps at ~0.856
            # (measured), which is the fair ceiling for any learned model
            "latent_oracle_auc": 0.890,
            "observable_ceiling_auc": 0.856,
            "seconds": rep["train_seconds"],
        }
    results["_meta"] = {
        "n_events": n_events, "epochs": epochs,
        "platform": __import__("jax").devices()[0].platform,
    }
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
