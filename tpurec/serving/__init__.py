from tpurec.serving.kvstore import DictKVStore, open_kv_store  # noqa: F401
from tpurec.serving.indexer import OfflineIndexer, exact_topk, recall_at_k  # noqa: F401
from tpurec.serving.diversity import diverse_topk, greedy_diverse_topk  # noqa: F401
