from gnn_recsys_tpu.train.full_batch import (  # noqa: F401
    FullBatchConfig,
    train_full_batch,
    compute_embeddings,
)
