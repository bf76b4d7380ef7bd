from gnn_recsys_tpu.ops.message import (  # noqa: F401
    coo_segment_mean,
    coo_segment_max,
    csc_gather_mean,
    csc_gather_max,
    edge_dot,
)
