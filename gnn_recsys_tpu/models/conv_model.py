"""Hetero GraphSAGE-style model (flax.linen).

TPU-native re-design of the reference ``ConvModel`` + ``dglnn.HeteroGraphConv``
(``/root/reference/src/model.py:330-470``): optional per-ntype embedding
Linear, a stack of per-etype :class:`ConvLayer` with cross-etype aggregation
(``sum``/``mean``/``max``), and a cosine or MLP predictor.

Execution model differs from DGL: the graph is a static-shape pytree
(:class:`~gnn_recsys_tpu.graph.hetero.HeteroGraph`), one ``propagate`` call
runs a full layer-wise pass over all nodes (the "full neighbor" mode of the
reference, ``src/sampling.py:156-157``), and everything jit-compiles to XLA.
A sampled-tree minibatch path shares the same layers (see
``gnn_recsys_tpu/train/sampled.py``).

Layer count semantics match the reference exactly: ``n_layers`` counts the
embedding layer when present, so there are ``n_layers - 1`` conv layers when
``embedding_layer=True`` and ``n_layers`` otherwise
(``src/model.py:379-406``, ``src/sampling.py:153-155``).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gnn_recsys_tpu.graph.hetero import CanonicalEtype, HeteroGraph
from gnn_recsys_tpu.models.layers import (
    ConvLayer,
    NodeEmbedding,
    PredictingLayer,
    l2_normalize,
)
from gnn_recsys_tpu.ops.message import (
    coo_segment_max,
    coo_segment_mean,
    csc_gather_mean,
    csc_gather_max,
    edge_dot,
)

# Edge pairs to score: etype -> (src node ids, dst node ids), any shape.
PairDict = Dict[CanonicalEtype, Tuple[jax.Array, jax.Array]]


def _etype_key(etype: CanonicalEtype) -> str:
    return "__".join(etype)


class ConvModel(nn.Module):
    """Full hetero message-passing model.

    Attributes mirror the reference constructor (``src/model.py:336-413``).
    ``dims`` is the ``dim_dict`` as a hashable tuple of (name, dim) pairs
    with entries for every node type plus ``hidden`` and ``out``.
    """

    canonical_etypes: Tuple[CanonicalEtype, ...]
    dims: Tuple[Tuple[str, int], ...]
    n_layers: int = 3
    norm: bool = True
    dropout: float = 0.0
    aggregator_type: str = "mean"
    pred: str = "cos"
    aggregator_hetero: str = "sum"
    embedding_layer: bool = True

    @property
    def dim_dict(self) -> Dict[str, int]:
        return dict(self.dims)

    @property
    def ntypes(self) -> Tuple[str, ...]:
        seen = []
        for s, _, d in self.canonical_etypes:
            for t in (s, d):
                if t not in seen:
                    seen.append(t)
        return tuple(seen)

    @property
    def out_dim(self) -> int:
        return self.dim_dict["out"]

    def setup(self):
        dim = self.dim_dict
        if self.pred not in ("cos", "nn"):
            raise KeyError(f"Prediction function {self.pred} not recognized.")

        if self.embedding_layer:
            self.embed = {
                nt: NodeEmbedding(dim["hidden"], name=f"{nt}_embed")
                for nt in self.ntypes
            }

        def conv_dict(idx: int, in_dims: Dict[str, int], out_feats: int):
            return {
                _etype_key(et): ConvLayer(
                    in_neigh_feats=in_dims[et[0]],
                    in_self_feats=in_dims[et[2]],
                    out_feats=out_feats,
                    aggregator_type=self.aggregator_type,
                    dropout=self.dropout,
                    norm=self.norm,
                    name=f"layer{idx}_{_etype_key(et)}",
                )
                for et in self.canonical_etypes
            }

    # Layer stack (reference src/model.py:379-406): input layer only
        # without an explicit embedding layer; n_layers-2 hidden; 1 output.
        layers = []
        idx = 0
        if not self.embedding_layer:
            layers.append(conv_dict(idx, dim, dim["hidden"]))
            idx += 1
        hidden_dims = {nt: dim["hidden"] for nt in self.ntypes}
        for _ in range(self.n_layers - 2):
            layers.append(conv_dict(idx, hidden_dims, dim["hidden"]))
            idx += 1
        layers.append(conv_dict(idx, hidden_dims, dim["out"]))
        self.layers = tuple(layers)

        if self.pred == "nn":
            self.pred_layer = PredictingLayer(name="pred_layer")

    @property
    def num_conv_layers(self) -> int:
        return (self.n_layers - 1) if self.embedding_layer else self.n_layers

    # ------------------------------------------------------------------
    # Forward pieces
    # ------------------------------------------------------------------
    def embed_features(self, h: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        """Per-ntype feature projection (reference src/model.py:462-466)."""
        if not self.embedding_layer:
            return dict(h)
        return {nt: self.embed[nt](x) if nt in self.embed else x for nt, x in h.items()}

    def _one_etype(
        self,
        layer: ConvLayer,
        graph: HeteroGraph,
        etype: CanonicalEtype,
        h: Dict[str, jax.Array],
        deterministic: bool,
    ) -> jax.Array:
        """Aggregate + combine for one etype. Returns z for dst nodes."""
        src_t, _, dst_t = etype
        rel = graph.rels[etype]
        h_src = layer.transform_src(h[src_t], deterministic=deterministic)

        # *_edge variants only weight by occurrence on user-item etypes
        # (reference src/model.py:174-221).
        edge_weight = None
        if (
            layer.edge_weighted
            and src_t in ("user", "item")
            and dst_t in ("user", "item")
            and "occurrence" in rel.edata
        ):
            edge_weight = rel.edata["occurrence"].astype(h_src.dtype)

        reducer = layer.reducer
        num_dst = graph.num_nodes(dst_t)
        if reducer == "mean":
            agg = coo_segment_mean(h_src, rel.src, rel.dst, num_dst, edge_weight)
        elif reducer == "max":
            agg = coo_segment_max(h_src, rel.src, rel.dst, num_dst, edge_weight)
        else:  # lstm: needs ordered per-destination mailboxes -> CSC layout
            msgs = jnp.take(h_src, rel.nbr, axis=0)
            if edge_weight is not None:
                w = jnp.take(edge_weight, rel.nbr_eid, axis=0)
                msgs = msgs * w[..., None]
            msgs = jnp.where(rel.nbr_mask[..., None], msgs, 0.0)
            agg = layer.lstm_reduce(msgs, rel.nbr_mask)
        return layer.combine(h[dst_t], agg, deterministic=deterministic)

    def _cross_etype_reduce(self, zs: jax.Array) -> jax.Array:
        """Aggregate per-etype outputs for one dst ntype
        (dglnn.HeteroGraphConv aggregate=, reference src/model.py:384,397,405)."""
        if self.aggregator_hetero == "sum":
            return jnp.sum(zs, axis=0)
        if self.aggregator_hetero == "mean":
            return jnp.mean(zs, axis=0)
        if self.aggregator_hetero == "max":
            return jnp.max(zs, axis=0)
        raise KeyError(
            f"Hetero aggregator {self.aggregator_hetero} not recognized."
        )

    def hetero_conv_step(
        self,
        layer_idx: int,
        graph: HeteroGraph,
        h: Dict[str, jax.Array],
        deterministic: bool = True,
    ) -> Dict[str, jax.Array]:
        """One HeteroGraphConv step over the full graph."""
        layer_dict = self.layers[layer_idx]
        per_dst: Dict[str, list] = {}
        for etype in graph.canonical_etypes:
            key = _etype_key(etype)
            if key not in layer_dict or etype[0] not in h or etype[2] not in h:
                continue
            z = self._one_etype(layer_dict[key], graph, etype, h, deterministic)
            per_dst.setdefault(etype[2], []).append(z)
        return {
            dst: self._cross_etype_reduce(jnp.stack(zs, axis=0))
            for dst, zs in per_dst.items()
        }

    def get_repr(
        self,
        graph: HeteroGraph,
        h: Dict[str, jax.Array],
        deterministic: bool = True,
    ) -> Dict[str, jax.Array]:
        """All conv layers, full-graph layer-wise (reference src/model.py:415-421
        with blocks == the whole graph, i.e. the 'full' neighbor mode)."""
        for i in range(len(self.layers)):
            h = self.hetero_conv_step(i, graph, h, deterministic=deterministic)
        return h

    # ------------------------------------------------------------------
    # Scoring
    # ------------------------------------------------------------------
    def score_pairs(
        self,
        h: Dict[str, jax.Array],
        pairs: PairDict,
    ) -> Dict[CanonicalEtype, jax.Array]:
        """Score (src, dst) node-id pairs per etype.

        Cosine mode: L2-normalize then dot (reference src/model.py:317-327).
        NN mode: MLP on concatenated embeddings (src/model.py:275-305).
        Pair id arrays may have any shape; scores keep that shape.
        """
        out = {}
        for etype, (src_ids, dst_ids) in pairs.items():
            src_t, _, dst_t = etype
            hu, hv = h[src_t], h[dst_t]
            shape = src_ids.shape
            src_flat = src_ids.reshape(-1)
            dst_flat = dst_ids.reshape(-1)
            if self.pred == "cos":
                scores = edge_dot(
                    l2_normalize(hu), l2_normalize(hv), src_flat, dst_flat
                )
            else:
                eu = jnp.take(hu, src_flat, axis=0)
                ev = jnp.take(hv, dst_flat, axis=0)
                scores = self.pred_layer(
                    jnp.concatenate([eu, ev], axis=-1)
                ).reshape(-1)
            out[etype] = scores.reshape(shape)
        return out

    def __call__(
        self,
        graph: HeteroGraph,
        features: Dict[str, jax.Array],
        pos_pairs: PairDict,
        neg_pairs: PairDict,
        deterministic: bool = True,
    ):
        """Full pass: embed -> conv stack -> score positives & negatives
        (reference ``ConvModel.forward``, src/model.py:423-470)."""
        h = self.embed_features(features)
        h = self.get_repr(graph, h, deterministic=deterministic)
        pos_score = self.score_pairs(h, pos_pairs)
        neg_score = self.score_pairs(h, neg_pairs)
        return h, pos_score, neg_score
