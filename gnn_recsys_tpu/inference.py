"""On-demand inference: load a saved run, embed, recommend.

Library core of the reference's inference CLI
(``/root/reference/main_inference.py:20-175`` + ``src/utils_inference.py``):
map external customer ids to node ids, rebuild the model from the saved
config, compute embeddings for the requested users and the full catalog,
run batched top-k retrieval with already-bought exclusion, and map node ids
back to external item ids.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
import pandas as pd

from gnn_recsys_tpu.graph.hetero import HeteroGraph
from gnn_recsys_tpu.models.conv_model import ConvModel
from gnn_recsys_tpu.ops.membership import PaddedPairSet, build_padded_pair_set
from gnn_recsys_tpu.retrieval.recs import get_recs
from gnn_recsys_tpu.train.checkpoint import load_run, model_kwargs_to_config
from gnn_recsys_tpu.train.minibatch import infer_embeddings


def fetch_uids(user_ids: Sequence, ctm_id_df: pd.DataFrame) -> np.ndarray:
    """External customer ids -> node ids (reference utils_inference.py:15-28)."""
    ext_col = [c for c in ctm_id_df.columns if c != "ctm_new_id"][0]
    mapping = dict(zip(ctm_id_df[ext_col], ctm_id_df["ctm_new_id"]))
    missing = [u for u in user_ids if u not in mapping]
    if missing:
        raise KeyError(f"unknown user ids: {missing[:5]}")
    return np.asarray([mapping[u] for u in user_ids], dtype=np.int32)


def postprocess_recs(
    recs: np.ndarray,
    user_node_ids: np.ndarray,
    pdt_id_df: pd.DataFrame,
    ctm_id_df: pd.DataFrame,
) -> Dict:
    """Node-id recs -> external-id recs (reference utils_inference.py:31-40)."""
    item_col = [c for c in pdt_id_df.columns if c != "pdt_new_id"][0]
    user_col = [c for c in ctm_id_df.columns if c != "ctm_new_id"][0]
    item_map = dict(zip(pdt_id_df["pdt_new_id"], pdt_id_df[item_col]))
    user_map = dict(zip(ctm_id_df["ctm_new_id"], ctm_id_df[user_col]))
    return {
        user_map[int(u)]: [item_map[int(i)] for i in row]
        for u, row in zip(user_node_ids, np.asarray(recs))
    }


def already_bought_from_graph(
    graph: HeteroGraph, etype=("user", "buys", "item")
) -> Tuple[np.ndarray, np.ndarray]:
    """(user, item) pairs already purchased (reference main_inference.py:95-99
    uses graph.out_edges on 'buys')."""
    rel = graph.rels[etype]
    return np.asarray(rel.src), np.asarray(rel.dst)


def inference_ondemand(
    run_dir: str,
    user_ids: Sequence,
    k: int = 10,
    remove_already_bought: bool = True,
    node_batch_size: int = 128,
    inference_mode: str = "full_graph",
    use_popularity: Optional[bool] = None,
    weight_popularity: float = 1.0,
    rebuild_dataframes: Optional[Dict] = None,
    mesh=None,
) -> Dict:
    """Recommendations for external user ids from a saved run directory.

    Mirrors ``inference_ondemand`` (main_inference.py:20-175): load graph +
    id maps + model, embed users and full catalog, retrieve top-k, map ids.
    ``user_ids='all'`` recommends for every known user.  When the run has no
    saved graph, ``rebuild_dataframes`` rebuilds it from raw data with the
    saved fixed params (reference main_inference.py:69-87 rebuild path).

    ``mesh``: a ``jax.sharding.Mesh`` distributes serving — embedding
    inference data-parallel over every device, retrieval with the item
    catalog row-sharded (retrieval/sharded.py; results equal the
    single-device path exactly).

    ``use_popularity=None`` (default) resolves from the SAVED run's
    hyperparameters: the reference boost (src/metrics.py:69-72) is
    applied iff the run trained the hinge objective with
    popularity_importance on — it transfers ~+4% there and is NEGATIVE
    for softmax-trained latents (``serve_with_popularity_boost``).
    Pass True/False to override.
    """
    run = load_run(run_dir)
    graph = run["graph"]
    id_maps = run["id_maps"] or {}
    if graph is None and rebuild_dataframes is not None:
        from gnn_recsys_tpu.config import FixedParams
        from gnn_recsys_tpu.data.etl import GraphData

        fp = FixedParams(**(run["fixed_params"] or {}))
        gd = GraphData.from_dataframes(fp, **rebuild_dataframes)
        graph = gd.graph
        id_maps = {"ctm_id": gd.ctm_id, "pdt_id": gd.pdt_id,
                   "spt_id": gd.spt_id}
    if graph is None:
        raise FileNotFoundError(
            f"{run_dir}/graph.npz missing (pass rebuild_dataframes to "
            f"rebuild from raw data)"
        )
    ctm_id_df = id_maps.get("ctm_id")
    pdt_id_df = id_maps.get("pdt_id")

    model = ConvModel(**model_kwargs_to_config(run["model_kwargs"]))
    params = run["params"]

    if isinstance(user_ids, str) and user_ids == "all":
        user_node_ids = np.arange(graph.num_nodes("user"), dtype=np.int32)
    elif ctm_id_df is not None:
        user_node_ids = fetch_uids(user_ids, ctm_id_df)
    else:
        user_node_ids = np.asarray(user_ids, dtype=np.int32)

    features = {nt: graph.ndata[nt]["features"] for nt in graph.ntypes}
    h = infer_embeddings(
        model, params, graph, features, mode=inference_mode,
        node_batch_size=node_batch_size, ntypes=("user", "item"),
        mesh=mesh,
    )

    already: Optional[PaddedPairSet] = None
    if remove_already_bought:
        ab_u, ab_i = already_bought_from_graph(graph)
        already = build_padded_pair_set(
            ab_u, ab_i, num_src=graph.num_nodes("user")
        )
    if use_popularity is None:
        # Auto: boost iff the SAVED run's hyperparameters say it
        # transfers (popularity_importance on AND a hinge objective —
        # the boost is negative for softmax-trained latents; see
        # HyperParams.serve_with_popularity_boost).
        import dataclasses as _dc

        from gnn_recsys_tpu.config import HyperParams

        hp_dict = run["hyper_params"] or {}
        known = {f.name for f in _dc.fields(HyperParams)}
        hyper = HyperParams(
            **{k: v for k, v in hp_dict.items() if k in known}
        )
        use_popularity = hyper.serve_with_popularity_boost
    popularity = None
    if use_popularity and "popularity" in graph.ndata.get("item", {}):
        popularity = graph.ndata["item"]["popularity"].reshape(-1)

    from gnn_recsys_tpu.retrieval.recs import model_score_fn

    if mesh is not None:
        from gnn_recsys_tpu.retrieval.sharded import get_recs_sharded

        axis = "model" if mesh.shape.get("model", 1) > 1 else "data"
        recs = np.asarray(
            get_recs_sharded(
                mesh,
                h["user"],
                h["item"],
                jnp.asarray(user_node_ids),
                k,
                already_bought=already,
                remove_already_bought=remove_already_bought,
                score_fn=model_score_fn(model.pred, params),
                popularity=popularity,
                weight_popularity=weight_popularity,
                axis=axis,
            )
        )
    else:
        recs = np.asarray(
            get_recs(
                h["user"],
                h["item"],
                jnp.asarray(user_node_ids),
                k,
                already_bought=already,
                remove_already_bought=remove_already_bought,
                score_fn=model_score_fn(model.pred, params),
                popularity=popularity,
                weight_popularity=weight_popularity,
            )
        )
    if pdt_id_df is not None and ctm_id_df is not None:
        return postprocess_recs(recs, user_node_ids, pdt_id_df, ctm_id_df)
    return {int(u): row.tolist() for u, row in zip(user_node_ids, recs)}
