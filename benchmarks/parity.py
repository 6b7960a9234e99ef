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
        raw,
        gen.encoder,
    )


def _rank_auc(scores, labels):
    """Exact AUC via rank statistic (Mann-Whitney)."""
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty(len(scores))
    ranks[order] = np.arange(1, len(scores) + 1)
    # midranks for ties
    s_sorted = scores[order]
    i = 0
    while i < len(s_sorted):
        j = i
        while j + 1 < len(s_sorted) and s_sorted[j + 1] == s_sorted[i]:
            j += 1
        if j > i:
            ranks[order[i : j + 1]] = 0.5 * (i + j) + 1.0
        i = j + 1
    pos = labels > 0
    n_pos, n_neg = pos.sum(), (~pos).sum()
    return float((ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


def _decode_map(encoder, col, prefix):
    """encoded id -> planted tag index, via the saved label-encode recorder."""
    return {v: int(k[len(prefix):]) for k, v in encoder.recorder[col].items()}


def dssm_oracle(raw, encoder, pos, uniq, truth):
    """Bayes-oracle AUC and recall@100, computed from the PLANTED affinities
    (make_ecommerce_raw's oracle.npz) on exactly the corpus + positives the
    model recall uses — the numeric ceiling VERDICT r1 asked for in place of
    the prose '~0.25' estimate."""
    orc = np.load(raw["oracle_path"])
    a11, a22, a13, sig = orc["a11"], orc["a22"], orc["a13"], float(orc["signal"])
    auc = _rank_auc(orc["event_scores"], orc["event_labels"])
    # decode encoded feature ids back to planted tag indices
    d_u1 = _decode_map(encoder, "user_tag1", "ut1_")
    d_u2 = _decode_map(encoder, "user_tag2", "ut2_")
    d_i1 = _decode_map(encoder, "item_tag1", "it1_")
    d_i2 = _decode_map(encoder, "item_tag2", "it2_")
    d_i3 = _decode_map(encoder, "item_tag3", "it3_")
    it1 = np.array([d_i1[v] for v in uniq[:, 0]])
    it2 = np.array([d_i2[v] for v in uniq[:, 1]])
    it3 = np.array([d_i3[v] for v in uniq[:, 2]])
    hits = 0
    n = len(truth)
    u1 = np.array([d_u1[v] for v in pos["user_tag1"][:n]])
    u2 = np.array([d_u2[v] for v in pos["user_tag2"][:n]])
    k = min(100, len(uniq))
    for r in range(n):
        s = sig * (a11[u1[r], it1] + a22[u2[r], it2] + a13[u1[r], it3]) / 3.0
        top = np.argpartition(-s, k - 1)[:k]
        hits += int(truth[r] in top)
    return auc, hits / n


def run_ranking(
    name, info, train, test, epochs, lr, batch=512, loss="bce", dim=16, l2=0.0,
    model_params=None, emb_l2=0.0, trials=3, optimizer_kwargs=None,
):
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
        model=ModelConfig(
            name=name,
            params=dict(model_params or {}),
            embedding=EmbeddingConfig(dim=dim, used_id_l2=l2),
        ),
        train=TrainConfig(
            batch_size=batch,
            epochs=epochs,
            log_every_steps=0,
            loss=loss,
            optimizer=OptimizerConfig(
                learning_rate=lr, embedding_l2=emb_l2, **(optimizer_kwargs or {})
            ),
            early_stop=__import__("tpurec.config", fromlist=["EarlyStopConfig"]).EarlyStopConfig(num_trials=trials),
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
    recall = float(np.mean(np.any(idx == truth[:, None], axis=1)))
    return recall, pos, uniq, truth[:2000]


def bench_retrieval_recall(
    name, info, train, test, raw, gen_dir, epochs, ks=(20, 100), n_eval=2000,
    model_params=None, lr=0.002, dim=32, trials=3, batch=512,
):
    """Train a multi-interest retrieval tower and measure recall@k over the
    full item corpus, next to the numerically-computed Bayes oracle
    (rank every item by the PLANTED user-topic/affinity score).

    Training follows the reference's 6.MIND 'auto' protocol: sampled softmax
    over [positive ∥ N uniformly sampled negative items]
    (tf.nn.sampled_softmax_loss, 6.MIND/CustomLayers.py:853-863) via
    model_params['num_sampled_negatives']; without it the loss degrades to
    plain in-batch softmax (the r2 recipe — measured 58-75% of oracle)."""
    import jax
    import jax.numpy as jnp

    # retrieval training consumes positives only: the reference's MIND
    # pipeline trains next-item prediction on click logs with sampled
    # negatives (6.MIND/CustomLayers.py:252-261)
    pos_train = {k: v[train["label"] > 0] for k, v in train.items()}
    state, trainer, rep = run_ranking(
        name, info, pos_train, test, epochs * 2, lr=lr, batch=batch,
        loss="in_batch_softmax", dim=dim, model_params=model_params,
        trials=trials,
    )
    model = trainer.model
    variables = {"params": state.params, **state.model_state}

    # item corpus: every item profile, encoded through the saved id maps
    with open(os.path.join(gen_dir, "feature_dict.json")) as f:
        maps = json.load(f)
    items = sorted(maps["item_id"].items(), key=lambda kv: kv[1])
    item_raw_idx = np.array([int(k[1:]) for k, _ in items])  # 'i123' -> 123
    item_ids = np.array([v for _, v in items], np.int64)
    orc = np.load(raw["oracle_path"])
    i_tag, u_tag = orc["i_tag"], orc["u_tag"]
    tag_of = np.array(
        [maps["item_tag"][f"it{i_tag[ri]}"] for ri in item_raw_idx], np.int64
    )
    L = info.max_seq_length
    n_corpus = len(item_ids)
    corpus_batch = {
        "item_id": jnp.asarray(item_ids),
        "item_tag": jnp.asarray(tag_of),
        "user_tag": jnp.zeros(n_corpus, jnp.int64),
        # one-step dummy history: item_embedding ('_target') never reads it
        "history": jnp.asarray(
            np.pad(item_ids[:, None], ((0, 0), (0, L - 1)))
        ),
        "history_tags": jnp.asarray(np.pad(tag_of[:, None], ((0, 0), (0, L - 1)))),
    }
    out_c = jax.jit(lambda b: model.apply(variables, b, train=False))(corpus_batch)
    item_emb = np.asarray(out_c["item_embedding"], np.float32)

    # user side: first n_eval held-out positives, scored by max over valid
    # interest capsules (serving semantics — label-aware attention would leak
    # the candidate)
    pos = {k: v[test["label"] > 0][:n_eval] for k, v in test.items()}
    out_u = jax.jit(lambda b: model.apply(variables, b, train=False))(
        {k: jnp.asarray(v) for k, v in pos.items()}
    )
    if "interest_capsules" in out_u:
        caps = np.asarray(out_u["interest_capsules"], np.float32)  # (B, K, D)
    else:  # single-interest towers (SDM fusion gate, etc.)
        caps = np.asarray(out_u["user_embedding"], np.float32)[:, None, :]
    cap_mask = np.asarray(
        out_u.get("capsule_mask", np.ones(caps.shape[:2])), np.float32
    )
    scores = np.einsum("bkd,nd->bkn", caps, item_emb)
    scores = np.where(cap_mask[:, :, None] > 0, scores, -np.inf).max(axis=1)
    enc2row = {int(e): r for r, e in enumerate(item_ids)}
    truth = np.array([enc2row[int(e)] for e in pos["item_id"]])
    nneg = (model_params or {}).get("num_sampled_negatives", 0)
    entry = {
        "n_corpus": n_corpus,
        "loss": f"sampled_softmax({nneg})" if nneg else "in_batch_softmax",
        "seconds": rep["train_seconds"],
    }
    for k in ks:
        topk = np.argpartition(-scores, k - 1, axis=1)[:, :k]
        entry[f"recall@{k}"] = float(np.mean(np.any(topk == truth[:, None], 1)))

    # Bayes oracle on the same corpus: true score for (user, item) from the
    # planted topic/affinity parameters, over the same positive events
    user_topic, item_topic = orc["user_topic"], orc["item_topic"]
    affinity, sig, n_topics = orc["affinity"], float(orc["signal"]), int(orc["n_topics"])
    events = [
        json.loads(line) for line in open(raw["events_path"]) if '"label": 1' in line
    ]
    rng = np.random.default_rng(0)
    sample = rng.choice(len(events), size=min(n_eval, len(events)), replace=False)
    hits = {k: 0 for k in ks}
    for si in sample:
        ev = events[si]
        u, i = int(ev["user_id"][1:]), int(ev["item_id"][1:])
        topical = user_topic[u][item_topic[item_raw_idx]] * n_topics
        s = sig * (
            0.7 * (topical - 1.0)
            + 0.3 * affinity[u_tag[u], i_tag[item_raw_idx]]
        )
        t = int(np.where(item_raw_idx == i)[0][0])
        for k in ks:
            hits[k] += int(t in np.argpartition(-s, k - 1)[:k])
    for k in ks:
        entry[f"oracle_recall@{k}"] = hits[k] / len(sample)
    return entry


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small data / few epochs")
    ap.add_argument(
        "--models",
        default="fm,deepfm,dssm,fm_weak,autoint_weak,mmoe,din,dien,eta,mind,comirec,sdm,sine",
    )
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

    def save():
        # written after EVERY entry so a crash partway keeps finished results
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)

    root = tempfile.mkdtemp(prefix="parity_")
    if {"fm", "deepfm", "dssm"} & set(models):
        info, train, test, raw, encoder = build_tabular(root, n_events)
        if "fm" in models:
            _, _, rep = run_ranking("fm", info, train, test, epochs, lr=0.01)
            results["fm"] = {"eval_auc": rep["best_eval"]["auc"], "target": 0.59,
                             "note": "reference FM is on weak-signal DCN data (0.5879); "
                                     "same-generator oracle here is ~0.94",
                             "seconds": rep["train_seconds"]}
            save()
        if "deepfm" in models:
            _, _, rep = run_ranking("deepfm", info, train, test, epochs, lr=0.005)
            results["deepfm"] = {"eval_auc": rep["best_eval"]["auc"], "target": 0.9244,
                                 "seconds": rep["train_seconds"]}
            save()
        if "dssm" in models:
            # the reference trains DSSM dual-tower pointwise with BCE on the
            # click label (cosine → [0,1]) and reports eval AUC 0.9225 — the
            # apples-to-apples parity metric. The model's BCE now runs on a
            # learned-temperature logit (same ranking; see
            # DSSMTwoTowerRetrieval). recall@100 is our own extra, reported
            # against the numerically-computed Bayes oracle on the same
            # corpus/positives (dssm_oracle).
            state, trainer, rep = run_ranking(
                "dssm_double", info, train, test, epochs * 2, lr=0.005, loss="bce",
            )
            recall, pos, uniq, truth = bench_dssm_recall(trainer, state, info, test)
            oracle_auc, oracle_recall = dssm_oracle(raw, encoder, pos, uniq, truth)
            results["dssm"] = {
                "eval_auc": rep["best_eval"]["auc"],
                "target": 0.9225,
                "recall@100": recall,
                "oracle_auc": oracle_auc,
                "oracle_recall@100": oracle_recall,
                "seconds": rep["train_seconds"],
            }
            save()
    if {"fm_weak", "autoint_weak"} & set(models):
        # the weak-signal regime the reference's ch.3 baselines were actually
        # measured in (FM 0.5879 / AutoInt 0.5972 on production impressions
        # with uid/iid/utag1-4/itag1-4 + itag4 origin/square/cube,
        # 3.DCN/ModelManager.py:14-15). make_dcn_raw plants the same regime;
        # oracle.npz records the numeric Bayes ceiling for the full score
        # and for the categorical-only view (all FM can see).
        from tpurec.data.generators import RankingTableGenerator
        from tpurec.data.loader import load_columnar, shard_paths
        from tpurec.data.synthetic import make_dcn_raw

        wroot = os.path.join(root, "weak")
        raw_w = make_dcn_raw(os.path.join(wroot, "raw"), n_events=n_events)
        orc = np.load(raw_w["oracle_path"])
        info_w = RankingTableGenerator(
            os.path.join(wroot, "gen"), raw_w["main_path"]
        ).run_all()
        train_w = load_columnar(shard_paths(os.path.join(wroot, "gen"), "train"))
        test_w = load_columnar(shard_paths(os.path.join(wroot, "gen"), "test"))
        if "fm_weak" in models:
            # recipe from benchmarks/fm_weak_sweep.py (40+ configs swept; r4
            # winner 0.58797 at the sweep's budget): full-table coupled L2
            # split by order — 3e-4 on the interaction table (suppresses
            # spurious id-vector interactions), 4e-5 on the order-1 bias
            # table — under a cosine lr decay (weak-signal runs peak late;
            # the decay holds the peak instead of oscillating past it). The
            # probe ceiling on this data is 0.58829 (ridge LR with an
            # EXPLICIT utag1×itag1 cross); tags-only Bayes is 0.5836 —
            # anything above it proves id-signal recovery. Keras' single l2
            # coefficient (reference recipe, 2.FM/CustomLayers.py:129-134)
            # measured 0.5611 here.
            e_fm = epochs * 2 - 4  # 20 at the full budget (sweep's winner)
            _, _, rep = run_ranking(
                "fm", info_w, train_w, test_w, e_fm, lr=0.001,
                batch=256, emb_l2=3e-4, trials=6,
                optimizer_kwargs={
                    "embedding_l2_order1": 4e-5,
                    "lr_schedule": "cosine",
                    "schedule_steps": e_fm * (480_000 // 256),
                },
            )
            results["fm_weak"] = {
                "eval_auc": rep["best_eval"]["auc"],
                "target": 0.5879,
                "oracle_auc": float(orc["oracle_auc"]),
                "cat_only_oracle_auc": float(orc["cat_only_auc"]),
                "tags_only_oracle_auc": float(orc["tags_only_auc"]),
                "ridge_probe_auc": 0.58829,
                "seconds": rep["train_seconds"],
            }
            save()
        if "autoint_weak" in models:
            # recipe from benchmarks/autoint_weak_sweep.py (r4 winner 0.6023,
            # best_epoch 19): the fm_weak lesson ported — split-order coupled
            # L2 (3e-4 interaction / 4e-5 order-1) at lr 1e-3, batch 256
            # beats the r3 used-id-L2 recipe (0.5937) by +0.009 AUC and the
            # reference's 0.5972 by +0.005
            _, _, rep = run_ranking(
                "autoint", info_w, train_w, test_w, epochs * 2 - 4, lr=0.001,
                batch=256, emb_l2=3e-4, trials=6,
                optimizer_kwargs={"embedding_l2_order1": 4e-5},
            )
            results["autoint_weak"] = {
                "eval_auc": rep["best_eval"]["auc"],
                "target": 0.5972,
                "oracle_auc": float(orc["oracle_auc"]),
                "seconds": rep["train_seconds"],
            }
            save()
    if "mmoe" in models:
        from tpurec.data.generators import ImpressionLogGenerator
        from tpurec.data.loader import load_columnar, shard_paths
        from tpurec.data.synthetic import make_impression_log_raw

        mroot = os.path.join(root, "mmoe")
        log = make_impression_log_raw(os.path.join(mroot, "raw"), n_events=n_events // 2)
        info = ImpressionLogGenerator(os.path.join(mroot, "gen"), log).run_all()
        train = load_columnar(shard_paths(os.path.join(mroot, "gen"), "train"))
        test = load_columnar(shard_paths(os.path.join(mroot, "gen"), "test"))
        # oracle ctr AUC on this data is ~0.977 — the target is reachable but
        # tight; double the epoch budget (early stop bounds it)
        _, _, rep = run_ranking(
            "mmoe", info, train, test, epochs * 2, lr=0.005, loss="multi_task"
        )
        orc = np.load(os.path.join(mroot, "raw", "oracle.npz"))
        results["mmoe"] = {
            "ctr_auc": rep["best_eval"]["ctr_auc"],
            "cvr_auc": rep["best_eval"]["cvr_auc"],
            "target": {"ctr": 0.9767, "cvr": 0.9582},
            # numeric Bayes ceilings from the planted scores (oracle.npz) —
            # the reference numbers were measured on ITS production data, so
            # the honest comparison is model-vs-this-data's-oracle
            "oracle_ctr_auc": float(orc["oracle_ctr_auc"]),
            "oracle_cvr_auc": float(orc["oracle_cvr_auc"]),
            "seconds": rep["train_seconds"],
        }
        save()
    if {"din", "dien", "eta", "mind", "comirec", "sdm", "sine"} & set(models):
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
        # recipes from benchmarks/retrieval_sweep.py: the cosine-logit head
        # (normalize_logits — L2-norm + learned temperature, the DSSM fix)
        # plus the accidental-hit-masked in-batch loss is MIND's sweep winner
        # (mind_cosmask 0.0465@20 / 0.1805@100 ≥ the 85%-of-oracle bar);
        # sampled softmax measurably HURT on this corpus (0.0265@20 — the
        # reference's full-table tf.nn.sampled_softmax_loss protocol,
        # 6.MIND/CustomLayers.py:853-863, loses to in-batch negatives here
        # both masked and unmasked: retrieval_sweep *neg* rows). ComiRec's
        # winner is the masked in-batch loss; cosine measured worse at K=4
        # (comirec_cosmask 0.033) but the r5 axes are in the sweep file.
        retrieval_recipes = {
            "mind": {"normalize_logits": True},
            "comirec": None,
            # same data/protocol; the sweep's cosmask recipe clears the 85%
            # bar for both (sdm 0.0485/0.192, sine 0.043/0.183)
            "sdm": {"normalize_logits": True},
            "sine": {"normalize_logits": True},
        }
        for name in ("mind", "comirec", "sdm", "sine"):
            if name in models:
                # n_eval 6000: recall@20 ~ 0.045 estimated over 2000 binary
                # trials carries +-0.0046 std — more than the distance to the
                # 85%-of-oracle bar; 6000 users cuts the eval noise ~1.7x
                results[name] = bench_retrieval_recall(
                    name, info, train, test, raw, os.path.join(sroot, "gen"),
                    epochs, model_params=retrieval_recipes[name], n_eval=6000,
                )
                save()
    if "dien" in models:
        # DIEN with the pipeline-sampled negative series feeding the aux loss
        # (reference get_auxiliary_loss, 5.DIN/CustomLayers.py:434-453) vs
        # aux disabled — demonstrating the aux loss BUYS AUC on the same data
        _, _, rep_aux = run_ranking("dien", info, train, test, epochs * 2, lr=0.01)
        _, _, rep_no = run_ranking(
            "dien", info, train, test, epochs * 2, lr=0.01,
            model_params={"aux_weight": 0.0},
        )
        results["dien"] = {
            "eval_auc": rep_aux["best_eval"]["auc"],
            "eval_auc_no_aux": rep_no["best_eval"]["auc"],
            "target": 0.8265,  # must match/beat DIN's r2 number on this data
            "observable_ceiling_auc": 0.856,
            "seconds": rep_aux["train_seconds"] + rep_no["train_seconds"],
        }
        save()
    if "eta" in models:
        # long-sequence ranking family entry: ETA's SimHash top-k retrieval +
        # GSU/ESU 0.2/0.8 loss (reference 7.SIM protocol) on the same
        # behavior-sequence data and oracle ceilings as DIN
        _, _, rep = run_ranking(
            "eta", info, train, test, epochs * 2, lr=0.005, loss="gsu_esu"
        )
        results["eta"] = {
            "eval_auc": rep["best_eval"]["auc"],
            "target": 0.80,  # oracle-relative: >=93.5% of the 0.856 ceiling
            "observable_ceiling_auc": 0.856,
            "seconds": rep["train_seconds"],
        }
        save()
    if "din" in models:
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
    save()
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
