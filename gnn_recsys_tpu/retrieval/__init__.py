from gnn_recsys_tpu.retrieval.recs import get_recs  # noqa: F401
from gnn_recsys_tpu.retrieval.metrics import (  # noqa: F401
    recs_to_metrics,
    get_metrics_at_k,
)
from gnn_recsys_tpu.retrieval.sharded import (  # noqa: F401
    get_recs_sharded,
    infer_embeddings_sharded,
    shard_catalog,
)
