"""Online serving: HTTP POST /predict with retrieve / rank paths.

API contract mirrors the reference Flask server (2.FM/OnlineServer.py:112-140):

    POST /predict {"user_id": ..., "type": "retrieve", "source": "kv"}      # precomputed
    POST /predict {"user_id": ..., "type": "retrieve"}                       # online tower + top-k
    POST /predict {"user_id": ..., "type": "rank", "item_ids": [...]}        # score candidates
    POST /predict {"user_id": ..., "type": "rank", "from_retrieval": true}

Implementation differences (TPU-native): stdlib ThreadingHTTPServer instead
of Flask (not in the image); online retrieval is an exact jitted matmul top-k
against the dumped item-embedding matrix instead of an unpickled BallTree
(2.FM/OnlineServer.py:56-75); ranking is one batched XLA inference over the
candidate×feature matrix (:77-101).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from tpurec.serving.indexer import exact_topk
from tpurec.serving.kvstore import DictKVStore


class RecommendService:
    """Model-side logic, separable from the HTTP layer for testing."""

    def __init__(
        self,
        user_tower: Optional[Callable] = None,  # dict inputs -> (B, D) or (B, K, D)
        ranker: Optional[Callable] = None,  # dict inputs -> (B,) scores
        user_profile: Optional[Dict[str, List[int]]] = None,
        item_profile: Optional[Dict[str, List[int]]] = None,
        user_feature_names: Sequence[str] = (),
        item_feature_names: Sequence[str] = (),
        kv_store: Optional[DictKVStore] = None,
        item_ids: Optional[Sequence[str]] = None,
        item_embeddings: Optional[np.ndarray] = None,
        item_categories: Optional[Sequence[int]] = None,
        key_prefix: str = "DSSM",
    ):
        self.user_tower = user_tower
        self.ranker = ranker
        self.user_profile = user_profile or {}
        self.item_profile = item_profile or {}
        self.user_feature_names = list(user_feature_names)
        self.item_feature_names = list(item_feature_names)
        self.kv = kv_store or DictKVStore()
        self.item_ids = list(item_ids or [])
        self.item_embeddings = item_embeddings
        self.key_prefix = key_prefix
        # One persistent jitted top-k over a pre-normalized device-resident
        # corpus. exact_topk builds a fresh jit closure per call — fine for
        # offline indexing, but per-REQUEST it retraces + recompiles
        # (measured 113 ms p50 on CPU); serving must trace once.
        # Multi-interest towers return (B, K, D) capsules; plain retrieval
        # scores every item by its best capsule (max over K), and the
        # diversity path (request knob "diversity_weight", requires
        # item_categories) runs ComiRec's greedy slate selection instead
        # (reference greedy_search_inference, 6.MIND/CustomLayers.py:868-963).
        self._online_topk = None
        self._diverse_topk = None
        if item_embeddings is not None:
            import jax

            from tpurec.serving.diversity import greedy_diverse_topk

            corpus = jnp.asarray(np.asarray(item_embeddings), jnp.float32)
            corpus = corpus / jnp.maximum(
                jnp.linalg.norm(corpus, axis=-1, keepdims=True), 1e-8
            )
            self._corpus = corpus

            from functools import partial

            def _capsule_scores(q):
                # q: (K, D) capsules (K=1 for single-vector towers) → (K, N)
                q = q.astype(jnp.float32)
                q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-8)
                return q @ corpus.T

            @partial(jax.jit, static_argnums=(1,))
            def _online_topk(q, k=20):
                return jax.lax.top_k(jnp.max(_capsule_scores(q), axis=0), k)

            self._online_topk = _online_topk
            if item_categories is not None:
                cats = jnp.asarray(np.asarray(item_categories))

                @partial(jax.jit, static_argnums=(1,))
                def _diverse_topk(q, k, weight):
                    scores = _capsule_scores(q)
                    idx = greedy_diverse_topk(scores, cats, k, weight)
                    return jnp.max(scores, axis=0)[idx], idx

                self._diverse_topk = _diverse_topk

    # -- retrieval -----------------------------------------------------------
    def retrieve_kv(self, user_id: str) -> Dict[str, float]:
        """Precomputed top-k from the KV store (reference retrieve :47-51)."""
        raw = self.kv.get(f"{self.key_prefix}_{user_id}")
        if raw is None:
            return {}
        items, scores = raw.split("\t")
        return {
            i: float(s) for i, s in zip(items.split(","), scores.split(","))
        }

    def retrieve_online(
        self, user_id: str, topk: int = 20, diversity_weight: float = 0.0
    ) -> Dict[str, float]:
        """User tower + exact top-k (reference retrieve_online :53-75).
        ``diversity_weight > 0`` (with item_categories configured) switches to
        ComiRec's diversity-greedy slate; reported scores stay the plain
        cosine relevance of the chosen items."""
        feats = self.user_profile.get(str(user_id))
        if feats is None or self.item_embeddings is None:
            return {}
        batch = {
            n: jnp.asarray([feats[j]]) for j, n in enumerate(self.user_feature_names)
        }
        emb = jnp.asarray(self.user_tower(batch))
        q = emb.reshape(-1, emb.shape[-1])  # (K, D); K=1 for (1, D) towers
        if diversity_weight > 0.0 and self._diverse_topk is not None:
            vals, idx = self._diverse_topk(q, topk, diversity_weight)
        else:
            vals, idx = self._online_topk(q, topk)
        idx, vals = np.asarray(idx), np.asarray(vals)
        return {self.item_ids[j]: float(s) for j, s in zip(idx, vals)}

    # -- ranking --------------------------------------------------------------
    def rank(
        self,
        user_id: str,
        item_ids: Sequence[str],
    ) -> Dict[str, float]:
        """Tile the user features across candidates, batch-score
        (reference rank :77-101)."""
        ufeats = self.user_profile.get(str(user_id))
        if ufeats is None:
            return {}
        valid = [i for i in item_ids if str(i) in self.item_profile]
        if not valid:
            return {}
        n_valid = len(valid)
        # pad to the next power-of-two bucket: one cached trace per bucket,
        # not one per candidate count
        padded = max(8, 1 << (n_valid - 1).bit_length())
        rows_u = np.tile(np.asarray(ufeats, np.int64), (padded, 1))
        rows_i = np.asarray(
            [self.item_profile[str(i)] for i in valid]
            + [self.item_profile[str(valid[0])]] * (padded - n_valid),
            np.int64,
        )
        batch = {}
        for j, n in enumerate(self.user_feature_names):
            batch[n] = jnp.asarray(rows_u[:, j])
        for j, n in enumerate(self.item_feature_names):
            batch[n] = jnp.asarray(rows_i[:, j])
        scores = np.asarray(self.ranker(batch)).reshape(-1)[:n_valid]
        order = np.argsort(-scores)
        return {str(valid[j]): float(scores[j]) for j in order}

    # -- dispatcher ------------------------------------------------------------
    def predict(self, request: dict) -> dict:
        rtype = request.get("type", "retrieve")
        user_id = str(request.get("user_id", ""))
        if rtype == "retrieve":
            if request.get("source") == "kv":
                result = self.retrieve_kv(user_id)
            else:
                result = self.retrieve_online(
                    user_id,
                    int(request.get("topk", 20)),
                    float(request.get("diversity_weight", 0.0)),
                )
            return {"user_id": user_id, "type": "retrieve", "result": result}
        if rtype == "rank":
            items = request.get("item_ids")
            if not items and request.get("from_retrieval"):
                items = list(self.retrieve_online(user_id, int(request.get("topk", 20))))
            result = self.rank(user_id, items or [])
            return {"user_id": user_id, "type": "rank", "result": result}
        return {"error": f"unknown type {rtype!r}"}


class _Handler(BaseHTTPRequestHandler):
    service: RecommendService = None  # set by make_server

    def do_POST(self):
        if self.path != "/predict":
            self.send_error(404)
            return
        length = int(self.headers.get("Content-Length", 0))
        try:
            request = json.loads(self.rfile.read(length) or b"{}")
            response = self.service.predict(request)
            code = 200
        except Exception as exc:  # noqa: BLE001 — surface as a 400 payload
            response = {"error": str(exc)}
            code = 400
        body = json.dumps(response).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # quiet
        pass


def make_server(service: RecommendService, host: str = "127.0.0.1", port: int = 5000):
    handler = type("Handler", (_Handler,), {"service": service})
    return ThreadingHTTPServer((host, port), handler)


def serve_background(service: RecommendService, host="127.0.0.1", port=5000):
    server = make_server(service, host, port)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server
