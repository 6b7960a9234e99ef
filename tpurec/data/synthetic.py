"""Synthetic raw-data generators.

The reference repo ships no raw data (only trained artifacts); its three data
families are (SURVEY §2): the tabular e-commerce logs of ch.2, the JSON
impression logs of ch.4, and the behavior-sequence logs of ch.5. These
generators produce raw files with the same shapes and planted preference
structure (tag-affinity matrices + noise) so that models trained on them
reach reference-class AUC and every pipeline stage can run end-to-end.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Tuple

import numpy as np


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def make_ecommerce_raw(
    output_dir: str,
    n_users: int = 2000,
    n_items: int = 1000,
    n_events: int = 100_000,
    n_user_tags: Tuple[int, int] = (20, 12),
    n_item_tags: Tuple[int, int, int] = (30, 15, 8),
    signal: float = 9.0,  # oracle AUC ≈ 0.94 (with the rank-4 affinities
    # below) — headroom above the reference's e-commerce eval AUC class
    # (BASELINE.md: DSSM 0.9225 / DeepFM 0.9244)
    seed: int = 0,
) -> Dict[str, str]:
    """Chapter-2-style raw files: user_feature.dat (user_id, user_tag1,
    user_tag2), item_feature.dat (item_id, item_tag1..3), shop.dat
    (timestamp, user_id, item_id, label) — the schema consumed by
    2.FM/DataGenerator.py:62-66.
    """
    rng = np.random.default_rng(seed)
    os.makedirs(output_dir, exist_ok=True)
    u1 = rng.integers(0, n_user_tags[0], n_users)
    u2 = rng.integers(0, n_user_tags[1], n_users)
    i1 = rng.integers(0, n_item_tags[0], n_items)
    i2 = rng.integers(0, n_item_tags[1], n_items)
    i3 = rng.integers(0, n_item_tags[2], n_items)
    # planted affinity structure between tag pairs. LOW-RANK (rank 2; total
    # intrinsic rank 6 across the three matrices): real preference matrices
    # are approximately low-rank, and the reference's two-tower DSSM reaches
    # 0.92-class AUC with dim-8 towers (BASELINE.md) — a full-rank random
    # Gaussian is unfactorizable at that dim (rank-8 of a random 20×30 keeps
    # ~55% energy) and even rank-4×3 = rank 12 exceeds dim-8 towers, i.e.
    # harder than the reference's data, not "same difficulty class".
    def lowrank(n, m, scale=1.0, rank=2):
        return scale * (rng.normal(0, 1, (n, rank)) @ rng.normal(0, 1, (rank, m))) / np.sqrt(rank)

    a11 = lowrank(n_user_tags[0], n_item_tags[0])
    a22 = lowrank(n_user_tags[1], n_item_tags[1])
    a13 = lowrank(n_user_tags[0], n_item_tags[2], scale=0.5)

    users = rng.integers(0, n_users, n_events)
    items = rng.integers(0, n_items, n_events)
    score = signal * (
        a11[u1[users], i1[items]] + a22[u2[users], i2[items]] + a13[u1[users], i3[items]]
    ) / 3.0
    base = -1.0  # negative-skewed CTR
    labels = (rng.random(n_events) < _sigmoid(base + score)).astype(np.int64)
    timestamps = np.sort(rng.integers(1_600_000_000, 1_700_000_000, n_events))

    user_path = os.path.join(output_dir, "user_feature.dat")
    item_path = os.path.join(output_dir, "item_feature.dat")
    main_path = os.path.join(output_dir, "shop.dat")
    with open(user_path, "w") as f:
        for uid in range(n_users):
            f.write(f"u{uid},ut1_{u1[uid]},ut2_{u2[uid]}\n")
    with open(item_path, "w") as f:
        for iid in range(n_items):
            f.write(f"i{iid},it1_{i1[iid]},it2_{i2[iid]},it3_{i3[iid]}\n")
    with open(main_path, "w") as f:
        for k in range(n_events):
            f.write(f"{timestamps[k]},u{users[k]},i{items[k]},{labels[k]}\n")
    return {"user_path": user_path, "item_path": item_path, "main_path": main_path}


def make_impression_log_raw(
    output_dir: str,
    n_events: int = 50_000,
    n_cat: int = 6,
    cat_cardinality: int = 25,
    n_continuous: int = 3,
    signal: float = 16.0,  # oracle CTR-AUC ≈ 0.977, matching the reference
    # 4.MMOE data's achievable class (BASELINE.md: ctr 0.9767 / cvr 0.9582)
    full_chain: bool = False,
    seed: int = 0,
) -> str:
    """Chapter-4-style JSON-lines impression log with nested feature records
    and a '0$#0'-format ctr/cvr label (4.MMOE/DataGenerator.py:22-116).
    CVR is only possible given CTR=1 (probability-chain structure).

    With ``full_chain=True`` the Label carries the 6-node conversion chain
    click$#cart$#collect$#none$#order$#pay: given a click, the user takes
    exactly one of {cart, collect, none} (cart-over-collect priority as in
    the reference graph, 9.ESCM2/CustomLayers.py:566-580); each branch
    converts to an order at its own planted rate, and orders pay at a planted
    rate — the data model the reference ESM2Layer's per-edge BCEs assume."""
    rng = np.random.default_rng(seed)
    os.makedirs(output_dir, exist_ok=True)
    cats = rng.integers(0, cat_cardinality, (n_events, n_cat))
    conts = rng.random((n_events, n_continuous))
    w_ctr = rng.normal(0, 1, (n_cat, cat_cardinality))
    w_cvr = rng.normal(0, 1, (n_cat, cat_cardinality))
    wc_ctr = rng.normal(0, 1, n_continuous)
    s_ctr = signal * np.mean(w_ctr[np.arange(n_cat)[None, :], cats], axis=1) + conts @ wc_ctr * 0.5
    s_cvr = signal * np.mean(w_cvr[np.arange(n_cat)[None, :], cats], axis=1)
    ctr = (rng.random(n_events) < _sigmoid(-1.0 + s_ctr)).astype(int)
    if full_chain:
        # branch choice (cart > collect > none), feature-dependent so every
        # edge is learnable
        w_br = rng.normal(0, 1, (n_cat, cat_cardinality))
        s_br = signal * 0.5 * np.mean(w_br[np.arange(n_cat)[None, :], cats], axis=1)
        cart = (ctr == 1) & (rng.random(n_events) < _sigmoid(-0.6 + s_br))
        collect = (ctr == 1) & ~cart & (rng.random(n_events) < _sigmoid(-0.2 + s_br))
        none = (ctr == 1) & ~cart & ~collect
        p_order = _sigmoid(-0.5 + s_cvr)
        order = (
            (cart & (rng.random(n_events) < p_order))
            | (collect & (rng.random(n_events) < 0.6 * p_order))
            | (none & (rng.random(n_events) < 0.15 * p_order))
        )
        pay = order & (rng.random(n_events) < _sigmoid(0.5 + 0.5 * s_cvr))
        chain = np.stack(
            [ctr, cart.astype(int), collect.astype(int), none.astype(int),
             order.astype(int), pay.astype(int)], axis=1,
        )
    else:
        cvr = ((rng.random(n_events) < _sigmoid(-0.5 + s_cvr)) & (ctr == 1)).astype(int)
    path = os.path.join(output_dir, "impression_log.jsonl")
    with open(path, "w") as f:
        for k in range(n_events):
            label = (
                "$#".join(str(int(v)) for v in chain[k])
                if full_chain
                else f"{ctr[k]}$#{cvr[k]}"
            )
            rec = {
                "Label": label,
                "features": {f"cat_{j}": f"v{cats[k, j]}" for j in range(n_cat)},
                "continuous": {
                    f"cont_{j}": float(conts[k, j]) for j in range(n_continuous)
                },
            }
            f.write(json.dumps(rec) + "\n")
    return path


def make_behavior_sequence_raw(
    output_dir: str,
    n_users: int = 1500,
    n_items: int = 800,
    n_events: int = 60_000,
    max_history: int = 30,
    n_user_tags: int = 15,
    n_item_tags: int = 20,
    signal: float = 2.5,
    n_positions: int = 0,
    n_pages: int = 0,
    position_bias: float = 0.35,
    seed: int = 0,
) -> Dict[str, str]:
    """Chapter-5-style sequence logs: each event has a candidate item, a
    clipped click-history sequence, user/item profile tags, and a label
    (schema of 5.DIN/DataGenerator.py). Users have latent interest clusters
    so history actually predicts the label (target-attention signal).

    Each event carries PARALLEL behavior series — the item-id history plus
    the aligned item-tag history (``history_tags``) — matching the
    reference's multi-series data model (visited_goods_ids /
    visited_shop_ids / visited_cate_ids, 5.DIN/ModelManager.py:13-20,
    6.MIND/CustomLayers.py:162-172).

    With ``n_positions > 0`` each event additionally carries display-context
    columns ``position`` (1-indexed slot) and ``page`` with a planted
    presentation bias — clicks decay with slot index — plus a chained
    ``conversion`` label that is NOT position-biased. This is the data model
    the reference's DMT position-bias towers assume (8.DMR/CustomLayers.py:
    570-574: bias logits are added to the task logits during training only).
    """
    rng = np.random.default_rng(seed)
    os.makedirs(output_dir, exist_ok=True)
    u_tag = rng.integers(0, n_user_tags, n_users)
    i_tag = rng.integers(0, n_item_tags, n_items)
    # latent interest vectors
    n_topics = 8
    user_topic = rng.dirichlet(np.ones(n_topics) * 0.3, n_users)
    item_topic = rng.integers(0, n_topics, n_items)
    affinity = rng.normal(0, 1, (n_user_tags, n_item_tags))

    # simulate per-user histories by sampling items ∝ user topic preference
    histories = []
    for u in range(n_users):
        p = user_topic[u][item_topic]
        p = p / p.sum()
        hist_len = rng.integers(3, max_history + 1)
        histories.append(rng.choice(n_items, size=hist_len, p=p))

    events_path = os.path.join(output_dir, "events.jsonl")
    with open(events_path, "w") as f:
        for _ in range(n_events):
            u = int(rng.integers(0, n_users))
            i = int(rng.integers(0, n_items))
            topical = user_topic[u][item_topic[i]] * n_topics  # ~1.0 mean
            s = signal * (0.7 * (topical - 1.0) + 0.3 * affinity[u_tag[u], i_tag[i]])
            rec = {
                "user_id": f"u{u}",
                "item_id": f"i{i}",
                "user_tag": f"ut{u_tag[u]}",
                "item_tag": f"it{i_tag[i]}",
                "history": [f"i{h}" for h in histories[u]],
                "history_tags": [f"it{i_tag[h]}" for h in histories[u]],
            }
            if n_positions > 0:
                pos = int(rng.integers(0, n_positions))
                page = int(rng.integers(0, max(1, n_pages)))
                # clicks decay with slot; conversions (given click) do not
                label = int(rng.random() < _sigmoid(-0.8 + s - position_bias * pos))
                conv = int(label and rng.random() < _sigmoid(-0.5 + s))
                rec["position"] = f"p{pos}"
                rec["page"] = f"pg{page}"
                rec["conversion"] = conv
            else:
                label = int(rng.random() < _sigmoid(-0.8 + s))
            rec["label"] = label
            f.write(json.dumps(rec) + "\n")
    profile_path = os.path.join(output_dir, "item_profiles.jsonl")
    with open(profile_path, "w") as f:
        for i in range(n_items):
            f.write(json.dumps({"item_id": f"i{i}", "item_tag": f"it{i_tag[i]}"}) + "\n")
    return {"events_path": events_path, "item_profile_path": profile_path}
