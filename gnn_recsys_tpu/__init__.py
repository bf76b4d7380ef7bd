"""TPU-native GNN recommendation framework.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of the
reference hieucnm/GNN-RecSys (DGL/PyTorch): heterogeneous user-item(-sport)
interaction graphs, GraphSAGE-style hetero message passing trained with a
max-margin ranking loss over sampled negatives, and full-catalog top-k
retrieval — all designed TPU-first (static shapes, padded CSR in HBM,
jit-compiled steps, mesh sharding) rather than translated from DGL.
"""

__version__ = "0.1.0"

from gnn_recsys_tpu.graph.hetero import HeteroGraph, Relation  # noqa: F401
