from tpurec.embedding.ops import row_sharded_lookup, used_id_l2  # noqa: F401
from tpurec.embedding.modules import (  # noqa: F401
    SharedEmbedding,
    LinearEmbedding,
    FieldAwareEmbedding,
)
