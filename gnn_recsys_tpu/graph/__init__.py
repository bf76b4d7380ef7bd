from gnn_recsys_tpu.graph.hetero import (  # noqa: F401
    HeteroGraph,
    Relation,
    build_relation,
    build_hetero_graph,
)
