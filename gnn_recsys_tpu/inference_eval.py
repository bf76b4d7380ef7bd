"""In-loop inference evaluation: re-build data under different windows and
re-evaluate a trained model.

Re-implements the reference's ``inference_hp.inference_fn``
(``/root/reference/inference_hp.py:19-202``): after training, rebuild the
graph from the raw data with (optionally overridden) ``remove`` /
time-window parameters — measuring how robust the trained weights are to a
different data regime — recompute embeddings with the SAVED parameters, and
report test metrics.  The model is parametric over the graph, so the same
weights apply to the rebuilt graph directly.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

from gnn_recsys_tpu.config import FixedParams, HyperParams
from gnn_recsys_tpu.data.etl import GraphData
from gnn_recsys_tpu.models.conv_model import ConvModel
from gnn_recsys_tpu.retrieval.metrics import get_metrics_at_k
from gnn_recsys_tpu.train.minibatch import infer_embeddings


def inference_fn(
    params,
    model: ConvModel,
    fixed: FixedParams,
    hyper: HyperParams,
    dataframes: Dict,
    remove_on_inference: Optional[float] = None,
    days_of_purchases: Optional[int] = None,
    days_of_clicks: Optional[int] = None,
    lifespan_of_items: Optional[int] = None,
    k: Optional[int] = None,
) -> Tuple[float, float, float]:
    """Rebuild data with overridden params; return (precision, recall,
    coverage) of the trained model on the rebuilt test ground truth."""
    overrides = {}
    if remove_on_inference is not None:
        overrides["remove"] = remove_on_inference
    if days_of_purchases is not None:
        overrides["days_of_purchases"] = days_of_purchases
    if days_of_clicks is not None:
        overrides["days_of_clicks"] = days_of_clicks
    if lifespan_of_items is not None:
        overrides["lifespan_of_items"] = lifespan_of_items
    inf_fixed = dataclasses.replace(fixed, **overrides)

    gd = GraphData.from_dataframes(
        inf_fixed,
        use_recency=hyper.use_recency,
        use_popularity=hyper.use_popularity,
        days_popularity=hyper.days_popularity,
        **dataframes,
    )
    g = gd.graph
    features = {
        nt: g.ndata[nt]["features"] for nt in g.ntypes
        if "features" in g.ndata[nt]
    }
    h = infer_embeddings(
        model, params, g, features, mode=inf_fixed.inference_mode,
        node_batch_size=inf_fixed.node_batch_size, ntypes=("user", "item"),
    )
    already = (
        gd.adjacency_dict.get(
            "purchases_src", gd.adjacency_dict.get("user_item_src")
        ),
        gd.adjacency_dict.get(
            "purchases_dst", gd.adjacency_dict.get("user_item_dst")
        ),
    )
    popularity = None
    # Boost only when it transfers: hinge-trained latents (see
    # HyperParams.serve_with_popularity_boost).
    if (hyper.serve_with_popularity_boost
            and "popularity" in g.ndata.get("item", {})):
        popularity = g.ndata["item"]["popularity"].reshape(-1)
    from gnn_recsys_tpu.retrieval.recs import model_score_fn

    return get_metrics_at_k(
        h["user"], h["item"], gd.ground_truth_test, already,
        k or inf_fixed.k, score_fn=model_score_fn(model.pred, params),
        popularity=popularity,
        weight_popularity=hyper.weight_popularity,
    )
