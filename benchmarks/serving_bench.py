"""Serving latency/QPS benchmark (VERDICT r3 item #8).

Measures the HTTP /predict paths of tpurec.serving.server against the
reference's API shapes (2.FM/OnlineServer.py:112-140):

    retrieve (kv)      — precomputed u2i lookup
    retrieve (online)  — user tower forward + exact top-k over the corpus
    rank k=20 / k=200  — candidate assembly + ranking-model scores

Reports p50/p95/p99 latency (ms) and QPS (sequential client + 8-thread
client) per path. Default platform is CPU — serving is a batch-1 workload
and this environment's TPU sits behind a network tunnel whose RTT would
dominate single-request latency (the reference likewise serves from host
CPU via Flask + SavedModel). Writes benchmarks/serving_bench_results.json.

Usage: python benchmarks/serving_bench.py [--platform tpu] [--requests N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_service(platform: str):
    if platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from tpurec.config import (
        EmbeddingConfig,
        ExperimentConfig,
        ModelConfig,
        OptimizerConfig,
        TrainConfig,
    )
    from tpurec.data.generators import TabularDataGenerator
    from tpurec.data.loader import ArrayLoader, load_columnar, shard_paths
    from tpurec.data.synthetic import make_ecommerce_raw
    from tpurec.serving import DictKVStore, OfflineIndexer
    from tpurec.serving.server import RecommendService, serve_background
    from tpurec.train import Trainer

    root = tempfile.mkdtemp(prefix="servbench_")
    raw = make_ecommerce_raw(
        os.path.join(root, "raw"), n_users=5000, n_items=2500, n_events=100_000
    )
    gen = TabularDataGenerator(
        output_path=os.path.join(root, "gen"),
        item_path=raw["item_path"],
        user_path=raw["user_path"],
        main_path=raw["main_path"],
    )
    info = gen.run_all()
    out = os.path.join(root, "gen")
    train = load_columnar(shard_paths(out, "train"))

    def quick_train(name, loss, extract):
        cfg = ExperimentConfig(
            model=ModelConfig(name=name, embedding=EmbeddingConfig(dim=16)),
            train=TrainConfig(
                batch_size=512, epochs=1, log_every_steps=0, loss=loss,
                compute_dtype="float32",
                optimizer=OptimizerConfig(learning_rate=5e-3),
            ),
        )
        trainer = Trainer(cfg, info)
        data = (
            {k: v[train["label"] > 0] for k, v in train.items()}
            if loss == "in_batch_softmax"
            else train
        )
        loader = ArrayLoader(data, 512, seed=0)
        state, _ = trainer.run(lambda: iter(loader), lambda: iter(loader))
        return extract(trainer, state)

    def towers(trainer, state):
        model = trainer.model
        variables = {"params": state.params, **state.model_state}
        u = jax.jit(lambda b: model.apply(variables, b, method=model.user_embedding))
        i = jax.jit(lambda b: model.apply(variables, b, method=model.item_embedding))
        return u, i

    def ranker_fn(trainer, state):
        model = trainer.model
        variables = {"params": state.params, **state.model_state}
        return jax.jit(lambda b: model.apply(variables, b)["output"])

    user_tower, item_tower = quick_train("dssm_double", "in_batch_softmax", towers)
    ranker = quick_train("deepfm", "bce", ranker_fn)
    with open(f"{out}/user_profile.json") as f:
        user_profile = json.load(f)
    with open(f"{out}/item_profile.json") as f:
        item_profile = json.load(f)
    indexer = OfflineIndexer(
        user_tower, item_tower, user_profile, item_profile,
        info.user_features, info.item_features, batch_size=1024,
    )
    kv = DictKVStore()
    result = indexer.run(os.path.join(root, "index"), kv_store=kv, topk=20)
    # per-item category for the diversity-greedy retrieval path: the first
    # item tag feature of each profile (ComiRec's aggregate-diversity
    # objective reranks by category novelty, 6.MIND/CustomLayers.py:868-963)
    cat_col = 1 if len(info.item_features) > 1 else 0
    item_categories = [
        int(item_profile[i][cat_col]) for i in result["item_ids"]
    ]
    service = RecommendService(
        user_tower=user_tower,
        ranker=ranker,
        user_profile=user_profile,
        item_profile=item_profile,
        user_feature_names=info.user_features,
        item_feature_names=info.item_features,
        kv_store=kv,
        item_ids=result["item_ids"],
        item_embeddings=result["item_embeddings"],
        item_categories=item_categories,
    )
    server = serve_background(service, port=0)
    return server, user_profile, item_profile


def bench_path(port: int, payloads, n: int, threads: int = 8):
    import urllib.request

    def post(payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        t0 = time.perf_counter()
        with urllib.request.urlopen(req) as resp:
            resp.read()
        return time.perf_counter() - t0

    for p in payloads[:10]:  # warm (jit compile, caches)
        post(p)
    lat = []
    t0 = time.perf_counter()
    for i in range(n):
        lat.append(post(payloads[i % len(payloads)]))
    seq_wall = time.perf_counter() - t0
    with ThreadPoolExecutor(threads) as ex:
        t0 = time.perf_counter()
        list(ex.map(post, [payloads[i % len(payloads)] for i in range(n)]))
        par_wall = time.perf_counter() - t0
    lat_ms = np.array(lat) * 1e3
    return {
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 3),
        "p95_ms": round(float(np.percentile(lat_ms, 95)), 3),
        "p99_ms": round(float(np.percentile(lat_ms, 99)), 3),
        "qps_sequential": round(n / seq_wall, 1),
        f"qps_{threads}threads": round(n / par_wall, 1),
        "requests": n,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--requests", type=int, default=300)
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(__file__), "serving_bench_results.json"),
    )
    args = ap.parse_args()
    server, user_profile, item_profile = build_service(args.platform)
    port = server.server_address[1]
    rng = np.random.default_rng(0)
    uids = rng.choice(list(user_profile.keys()), size=64).tolist()
    iids = list(item_profile.keys())
    results = {"platform": args.platform, "n_users": len(user_profile),
               "n_items": len(item_profile)}
    results["retrieve_kv"] = bench_path(
        port, [{"user_id": u, "type": "retrieve", "source": "kv"} for u in uids],
        args.requests,
    )
    results["retrieve_online_top20"] = bench_path(
        port, [{"user_id": u, "type": "retrieve", "topk": 20} for u in uids],
        args.requests,
    )
    # ComiRec diversity-greedy retrieval (k sequential argmax passes over the
    # corpus inside one jitted call) at k=20 and k=100
    results["retrieve_diverse_top20"] = bench_path(
        port,
        [
            {"user_id": u, "type": "retrieve", "topk": 20, "diversity_weight": 0.1}
            for u in uids
        ],
        args.requests,
    )
    results["retrieve_diverse_top100"] = bench_path(
        port,
        [
            {"user_id": u, "type": "retrieve", "topk": 100, "diversity_weight": 0.1}
            for u in uids
        ],
        args.requests,
    )
    results["rank_20"] = bench_path(
        port,
        [
            {"user_id": u, "type": "rank",
             "item_ids": rng.choice(iids, size=20).tolist()}
            for u in uids
        ],
        args.requests,
    )
    results["rank_200"] = bench_path(
        port,
        [
            {"user_id": u, "type": "rank",
             "item_ids": rng.choice(iids, size=200).tolist()}
            for u in uids
        ],
        args.requests,
    )
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
