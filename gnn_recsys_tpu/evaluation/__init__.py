from gnn_recsys_tpu.evaluation.explore import (  # noqa: F401
    explore_recs,
    explore_sports,
    check_coverage,
)
