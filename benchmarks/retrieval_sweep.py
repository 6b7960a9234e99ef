"""MIND / ComiRec recall tuning sweep (VERDICT r3 item #2).

Targets (85% of the numeric Bayes oracle on the same corpus):
    recall@20  >= 0.045   (oracle 0.0535)
    recall@100 >= 0.18    (oracle 0.212)

Sweeps the reference 'auto'-mode axes: sampled-negative count
(6.MIND/CustomLayers.py:853-863), interests K, label-aware attention power,
lr / dim / epochs. Writes benchmarks/retrieval_sweep.json incrementally.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "retrieval_sweep.json")


def main():
    from benchmarks.parity import bench_retrieval_recall
    from tpurec.data.generators import SequenceDataGenerator
    from tpurec.data.loader import load_columnar, shard_paths
    from tpurec.data.synthetic import make_behavior_sequence_raw

    root = tempfile.mkdtemp(prefix="retr_")
    raw = make_behavior_sequence_raw(
        os.path.join(root, "raw"), n_users=3000, n_items=1500,
        n_events=300_000, max_history=30,
    )
    info = SequenceDataGenerator(
        os.path.join(root, "gen"), raw["events_path"], max_seq_length=30
    ).run_all()
    train = load_columnar(shard_paths(os.path.join(root, "gen"), "train"))
    test = load_columnar(shard_paths(os.path.join(root, "gen"), "test"))
    gen_dir = os.path.join(root, "gen")

    results = {}
    if os.path.exists(OUT):
        try:
            with open(OUT) as f:
                results = json.load(f)
        except Exception:
            pass

    configs = [
        # (name, key-suffix, model_params, lr, dim, epochs)
        ("mind", "neg128", {"num_sampled_negatives": 128}, 0.002, 32, 12),
        ("mind", "neg512", {"num_sampled_negatives": 512}, 0.002, 32, 12),
        ("mind", "neg128_k8", {"num_sampled_negatives": 128, "num_interests": 8}, 0.002, 32, 12),
        ("mind", "neg128_p1", {"num_sampled_negatives": 128, "attention_power": 1.0}, 0.002, 32, 12),
        ("comirec", "neg128", {"num_sampled_negatives": 128}, 0.002, 32, 12),
        ("comirec", "neg512", {"num_sampled_negatives": 512}, 0.002, 32, 12),
        ("comirec", "neg128_k8", {"num_sampled_negatives": 128, "num_interests": 8}, 0.002, 32, 12),
        ("comirec", "inbatch_long", {}, 0.002, 32, 12),  # r2 recipe, 2x epochs
        # round-3b: cosine-logit head (normalize_logits) — the DSSM fix.
        # Sampled softmax measurably HURT above (0.0265 vs 0.040 in-batch),
        # so the cosine axis sweeps mostly over the in-batch loss.
        ("mind", "cos_inbatch", {"normalize_logits": True}, 0.002, 32, 12),
        ("comirec", "cos_inbatch", {"normalize_logits": True}, 0.002, 32, 12),
        ("mind", "cos_neg512", {"normalize_logits": True, "num_sampled_negatives": 512}, 0.002, 32, 12),
        ("mind", "cos_inbatch_lr005", {"normalize_logits": True}, 0.005, 32, 12),
        ("mind", "cos_inbatch_d64", {"normalize_logits": True}, 0.002, 64, 12),
        ("comirec", "cos_inbatch_d64", {"normalize_logits": True}, 0.002, 64, 12),
        # round-3c: MIND sits at 0.043/0.1805 with the cosine head (bar:
        # 0.045/0.18) — push epochs/K; ComiRec didn't take to cosine at
        # default K, try the dr variant and K=8 with it
        ("mind", "cos_e18", {"normalize_logits": True}, 0.002, 32, 18),
        ("mind", "cos_k8", {"normalize_logits": True, "num_interests": 8}, 0.002, 32, 12),
        ("comirec", "cos_dr", {"normalize_logits": True, "variant": "dr"}, 0.002, 32, 12),
        ("comirec", "cos_k8", {"normalize_logits": True, "num_interests": 8}, 0.002, 32, 12),
        ("comirec", "inbatch_e18", {}, 0.002, 32, 18),
        # round-3d: accidental-hit masking landed in losses.in_batch_softmax
        # (false-negative duplicates ~30%/batch at this corpus size) — fresh
        # keys so the masked loss is measured side by side
        ("mind", "cosmask", {"normalize_logits": True}, 0.002, 32, 12),
        ("mind", "cosmask_k8", {"normalize_logits": True, "num_interests": 8}, 0.002, 32, 12),
        ("comirec", "mask_inbatch", {}, 0.002, 32, 12),
        ("comirec", "cosmask", {"normalize_logits": True}, 0.002, 32, 12),
        ("sdm", "cosmask", {"normalize_logits": True}, 0.002, 32, 12),
        ("sine", "cosmask", {"normalize_logits": True}, 0.002, 32, 12),
        # round-4 (VERDICT r3 #6): ComiRec at 78% of oracle, bar 85%. The
        # sampled-softmax rows above were measured BEFORE the sampled-negative
        # accidental-hit mask landed (models/mind.py _sampled_logits) — fresh
        # keys re-measure it masked, per the reference's
        # remove_accidental_hits default (6.MIND/CustomLayers.py:853-863).
        # Plus K / batch (more in-batch negatives) / epoch pushes on the
        # masked-in-batch winner.
        ("comirec", "mask_neg512", {"num_sampled_negatives": 512}, 0.002, 32, 12),
        ("comirec", "cosmask_neg512", {"normalize_logits": True, "num_sampled_negatives": 512}, 0.002, 32, 12),
        ("comirec", "mask_k8", {"num_interests": 8}, 0.002, 32, 12),
        ("comirec", "mask_b1024", {}, 0.002, 32, 12, 1024),
        ("comirec", "mask_b2048", {}, 0.003, 32, 16, 2048),
        ("comirec", "mask_e24", {}, 0.002, 32, 24),
        ("comirec", "mask_dr", {"variant": "dr"}, 0.002, 32, 12),
        ("mind", "cosmask_b1024", {"normalize_logits": True}, 0.002, 32, 12, 1024),
        # round-5 (VERDICT r4 #4): close the last 0.0035@20 / 0.016@100 on
        # the masked-in-batch winner — interests count, dim, epochs, lr axes
        ("comirec", "mask_k6", {"num_interests": 6}, 0.002, 32, 12),
        ("comirec", "mask_k8_e18", {"num_interests": 8}, 0.002, 32, 18),
        ("comirec", "mask_d48", {}, 0.002, 48, 12),
        ("comirec", "mask_lr001_e24", {}, 0.001, 32, 24),
        ("comirec", "cosmask_k8", {"normalize_logits": True, "num_interests": 8}, 0.002, 32, 12),
        # r5b: SDM's SINGLE fused interest scores best@100 on this corpus and
        # every K>=6 row is worse — users plant few dominant topics, so push
        # K DOWN instead
        ("comirec", "mask_k2", {"num_interests": 2}, 0.002, 32, 12),
        ("comirec", "mask_k3", {"num_interests": 3}, 0.002, 32, 12),
        ("comirec", "cosmask_k2", {"normalize_logits": True, "num_interests": 2}, 0.002, 32, 12),
        ("mind", "cosmask_k2", {"normalize_logits": True, "num_interests": 2}, 0.002, 32, 12),
    ]
    for cfg in configs:
        name, suffix, mp, lr, dim, epochs = cfg[:6]
        batch = cfg[6] if len(cfg) > 6 else 512
        key = f"{name}_{suffix}_lr{lr}_d{dim}_e{epochs}" + (
            f"_b{batch}" if batch != 512 else ""
        )
        if key in results:
            print(f"skip {key}", flush=True)
            continue
        print(f"running {key}", flush=True)
        entry = bench_retrieval_recall(
            name, info, train, test, raw, gen_dir, epochs,
            model_params=mp, lr=lr, dim=dim, batch=batch,
        )
        results[key] = entry
        print(json.dumps({key: entry}), flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
