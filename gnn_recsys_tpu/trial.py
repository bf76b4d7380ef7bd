"""One full build/train/eval trial — the unit of work shared by the
hyperparameter-search CLI and the full-training CLI.

Mirrors the reference's ``train`` routine (``/root/reference/main.py:42-447``):
build the graph from data, split train/valid temporally, train with the
minibatch regime, compute test metrics on both the all-interaction and
purchase-only ground truths (main.py:279-312), optionally save the run when
recall clears the model-save threshold (8% specific / 20% general,
main.py:404-415), and emit loss/metric curves.
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np
from typing import Dict, Optional

from gnn_recsys_tpu.config import (
    GENERAL,
    SPECIFIC,
    DataPaths,
    FixedParams,
    HyperParams,
)
from gnn_recsys_tpu.data.etl import GraphData
from gnn_recsys_tpu.data.split import TrainValSplit, train_valid_split
from gnn_recsys_tpu.models.conv_model import ConvModel
from gnn_recsys_tpu.retrieval.metrics import get_metrics_at_k
from gnn_recsys_tpu.retrieval.recs import model_score_fn
from gnn_recsys_tpu.train.checkpoint import save_run
from gnn_recsys_tpu.train.minibatch import (
    MinibatchConfig,
    infer_embeddings,
    train_minibatch,
)
from gnn_recsys_tpu.utils.viz import plot_train_loss

# Model-save thresholds (reference main.py:404-405).
SAVE_THRESHOLDS = {SPECIFIC: 0.08, GENERAL: 0.20}


@dataclasses.dataclass
class TrialResult:
    recall: float
    precision: float
    coverage: float
    recall_purchase: float
    history: Dict
    train_time_s: float
    saved_to: Optional[str] = None
    # In-loop inference eval (reference main.py:418-436): recall of the
    # trained weights on a graph REBUILT with remove_on_inference user
    # sampling (robustness to a different data window); populated when
    # fixed.run_inference > 0.  The all-users variant rebuilds with
    # 710-day windows (run_inference > 1).
    inference_recall: Optional[float] = None
    inference_recall_all_users: Optional[float] = None


def build_model(
    graph_data: GraphData, fixed: FixedParams, hyper: HyperParams,
    dtype=None,
) -> ConvModel:
    """Assemble the ConvModel from config (reference main.py:189-205)."""
    g = graph_data.graph
    feat_dims = {
        nt: int(g.ndata[nt]["features"].shape[1]) for nt in g.ntypes
        if "features" in g.ndata[nt]
    }
    dims = tuple(
        sorted(
            {**feat_dims, "hidden": hyper.hidden_dim, "out": hyper.out_dim}
            .items()
        )
    )
    return ConvModel(
        canonical_etypes=g.canonical_etypes,
        dims=dims,
        n_layers=hyper.n_layers,
        norm=hyper.norm,
        dropout=hyper.dropout,
        aggregator_type=hyper.resolved_aggregator_type(fixed.duplicates),
        pred=fixed.pred,
        aggregator_hetero=hyper.aggregator_hetero,
        embedding_layer=hyper.embedding_layer,
        dtype=dtype,
        remat_levels=fixed.remat_levels,
    )


def minibatch_config(
    fixed: FixedParams, hyper: HyperParams, model: ConvModel,
    neg_pool_size: int = 2048,
) -> MinibatchConfig:
    n_conv = model.num_conv_layers
    if fixed.neighbor_sampler == "full":
        fanouts = tuple([-1] * n_conv)
    else:  # 'partial' = fanout-1 sampler (reference sampling.py:158-159)
        fanouts = tuple([1] * n_conv)
    neg_sample_size = hyper.neg_sample_size
    if fixed.bucket_shapes:
        # Collapse compile keys across HP points: round the negative
        # count UP to a 128 multiple (never fewer negatives than asked).
        neg_sample_size = -(-neg_sample_size // 128) * 128
    # Full-neighbor sampling at depth >= 3 multiplies padded row widths
    # per level: the pure tree forward's frontier grows as K^depth and a
    # deep HP trial OOMs HBM (observed: f32[316,48,24,48,512] = 35.8 GB
    # at n_layers=5 on a tiny graph).  The dedup'd block forward computes
    # each unique node once per level (DGL-block semantics) and bounds
    # every level by the node count, exactly like the reference's MFGs.
    dedup = fixed.neighbor_sampler == "full" and n_conv >= 3
    return MinibatchConfig(
        edge_batch_size=fixed.edge_batch_size,
        fanouts=fanouts,
        neg_sample_size=neg_sample_size,
        neg_mode="shared_pool",
        neg_pool_size=neg_pool_size,
        dedup=dedup,
        delta=hyper.delta,
        loss=hyper.loss,
        softmax_tau=hyper.softmax_tau,
        lr=hyper.lr,
        num_epochs=fixed.num_epochs,
        remove_false_negative=fixed.remove_false_negative,
        use_recency=hyper.use_recency,
        k=fixed.k,
        patience=fixed.patience,
    )


def run_trial(
    fixed: FixedParams,
    hyper: HyperParams,
    paths: Optional[DataPaths] = None,
    dataframes: Optional[Dict] = None,
    save_dir: Optional[str] = None,
    save_threshold: Optional[float] = None,
    plots_dir: Optional[str] = None,
    dtype=None,
    neg_pool_size: int = 2048,
    verbose: bool = False,
    check_embedding: bool = False,
) -> TrialResult:
    """Build data -> train -> test metrics (reference main.py:42-447)."""
    t0 = time.perf_counter()
    if dataframes is not None:
        gd = GraphData.from_dataframes(
            fixed,
            use_recency=hyper.use_recency,
            use_popularity=hyper.use_popularity,
            days_popularity=hyper.days_popularity,
            max_fanout=fixed.max_fanout,
            **dataframes,
        )
    else:
        gd = GraphData.from_paths(
            paths,
            fixed,
            use_recency=hyper.use_recency,
            use_popularity=hyper.use_popularity,
            days_popularity=hyper.days_popularity,
            max_fanout=fixed.max_fanout,
        )
    split: TrainValSplit = train_valid_split(
        gd.graph,
        gd.ground_truth_test,
        fixed,
        clicks_sample=hyper.clicks_sample,
        purchases_sample=hyper.purchases_sample,
    )
    model = build_model(gd, fixed, hyper, dtype=dtype)
    if fixed.bucket_shapes:
        # Collapse epoch-program compile keys across HP points: truncate
        # per-etype eid sets DOWN to a 256 multiple, dropping the OLDEST
        # edges (eids are time-ordered; the reference's recency sampling
        # keeps the most recent fraction, src/sampling.py:72-82).
        def _trunc(eids):
            return {
                et: v[len(v) % 256:] if len(v) >= 256 else v
                for et, v in eids.items()
            }

        split = dataclasses.replace(
            split,
            train_eids=_trunc(split.train_eids),
            valid_eids=_trunc(split.valid_eids),
        )
    # A shared negative pool larger than the catalog is pure waste.
    neg_pool_size = min(neg_pool_size, gd.num_nodes["item"])
    cfg = minibatch_config(fixed, hyper, model, neg_pool_size=neg_pool_size)

    g = gd.graph
    features = {
        nt: g.ndata[nt]["features"] for nt in g.ntypes
        if "features" in g.ndata[nt]
    }
    if fixed.neighbor_sampler == "full":
        # Lane-packed leaf feature cache: full-fanout leaves read one
        # contiguous [K*F] row per parent instead of K random 16-byte
        # gathers (graph/hetero.py:attach_leaf_features; value-identical).
        from gnn_recsys_tpu.graph.hetero import attach_leaf_features

        split = dataclasses.replace(
            split,
            train_graph=attach_leaf_features(split.train_graph, features),
        )
    state, history = train_minibatch(
        model,
        split.train_graph,
        g,
        features,
        split.train_eids,
        split.valid_eids,
        cfg,
        test_ground_truth=split.ground_truth_valid,
        subtrain_ground_truth=split.ground_truth_subtrain,
        already_bought=(
            gd.adjacency_dict.get("purchases_src", gd.adjacency_dict.get("user_item_src")),
            gd.adjacency_dict.get("purchases_dst", gd.adjacency_dict.get("user_item_dst")),
        ),
        start_epoch=fixed.start_epoch,
        verbose=verbose,
    )

    # Final test metrics on BOTH ground truths (main.py:279-312).
    # Test-time embeddings message-pass over the FULL graph, not the train
    # graph (reference nodeloader_test samples from valid_graph,
    # sampling.py:233-241).
    h = infer_embeddings(
        model, state.params, g, features, mode=fixed.inference_mode,
        node_batch_size=fixed.node_batch_size, ntypes=("user", "item"),
    )
    already = (
        gd.adjacency_dict.get("purchases_src", gd.adjacency_dict.get("user_item_src")),
        gd.adjacency_dict.get("purchases_dst", gd.adjacency_dict.get("user_item_dst")),
    )
    popularity = None
    # Boost only when it transfers: hinge-trained latents (see
    # HyperParams.serve_with_popularity_boost).
    if (hyper.serve_with_popularity_boost
            and "popularity" in g.ndata.get("item", {})):
        popularity = g.ndata["item"]["popularity"].reshape(-1)
    score_fn = model_score_fn(model.pred, state.params)
    precision, recall, coverage = get_metrics_at_k(
        h["user"], h["item"], gd.ground_truth_test, already, fixed.k,
        score_fn=score_fn,
        popularity=popularity, weight_popularity=hyper.weight_popularity,
    )
    if len(gd.ground_truth_purchase_test[0]):
        _, recall_purchase, _ = get_metrics_at_k(
            h["user"], h["item"], gd.ground_truth_purchase_test, already,
            fixed.k, score_fn=score_fn, popularity=popularity,
            weight_popularity=hyper.weight_popularity,
        )
    else:
        recall_purchase = 0.0

    saved_to = None
    threshold = (
        save_threshold
        if save_threshold is not None
        else SAVE_THRESHOLDS.get(fixed.item_id_type, 0.08)
    )
    if save_dir is not None and recall > threshold:
        save_run(
            save_dir,
            state.params,
            model_kwargs={
                "canonical_etypes": [list(e) for e in model.canonical_etypes],
                "dims": [list(d) for d in model.dims],
                "n_layers": model.n_layers,
                "norm": model.norm,
                "dropout": model.dropout,
                "aggregator_type": model.aggregator_type,
                "pred": model.pred,
                "aggregator_hetero": model.aggregator_hetero,
                "embedding_layer": model.embedding_layer,
            },
            fixed_params=fixed,
            hyper_params=hyper,
            graph=g,
            id_maps={"ctm_id": gd.ctm_id, "pdt_id": gd.pdt_id,
                     "spt_id": gd.spt_id},
            # Output artifacts (reference main_train.py:373-383 pickles
            # embeddings / already_bought / ground_truth to outputs/).
            extras={
                "user_embeddings": np.asarray(h["user"]),
                "item_embeddings": np.asarray(h["item"]),
                "already_bought": already,
                "ground_truth_test": gd.ground_truth_test,
                "ground_truth_purchase_test": gd.ground_truth_purchase_test,
            },
        )
        saved_to = save_dir

    # In-loop inference evaluation (reference main.py:418-436): rebuild
    # the data under the inference regime and re-evaluate the trained
    # weights — robustness to a different data window.  The model is
    # parametric over the graph, so the same params apply directly.
    inference_recall = inference_recall_all = None
    if fixed.run_inference > 0:
        from gnn_recsys_tpu.inference_eval import inference_fn

        raw_inputs = dataframes if dataframes is not None else dict(
            train=paths.train_path,
            test=paths.test_path,
            item_sport=paths.item_sport_path or None,
            user_sport=paths.user_sport_path or None,
            sport_sportg=paths.sport_sportg_path or None,
            item_feat=paths.item_feat_path,
            user_feat=paths.user_feat_path,
            sport_feat=paths.sport_feat_path or None,
            sport_onehot=paths.sport_onehot_path or None,
        )
        _, inference_recall, _ = inference_fn(
            state.params, model, fixed, hyper, raw_inputs,
            remove_on_inference=fixed.remove_on_inference,
        )
        if verbose:
            print(f"inference eval (remove={fixed.remove_on_inference}): "
                  f"recall@{fixed.k}={inference_recall:.4f}")
        if fixed.run_inference > 1:
            # "For all users": 710-day windows (reference main.py:426-436).
            _, inference_recall_all, _ = inference_fn(
                state.params, model, fixed, hyper, raw_inputs,
                remove_on_inference=fixed.remove_on_inference,
                days_of_purchases=710, days_of_clicks=710,
                lifespan_of_items=710,
            )
            if verbose:
                print(f"inference eval (all users, 710-day windows): "
                      f"recall@{fixed.k}={inference_recall_all:.4f}")

    if check_embedding:
        # Qualitative evaluation (reference main.py:314-400): example recs,
        # similar sports, demographic coverage.
        from gnn_recsys_tpu.config import ColumnConfig
        from gnn_recsys_tpu.evaluation.explore import (
            check_coverage,
            explore_recs,
            explore_sports,
        )
        from gnn_recsys_tpu.ops.membership import build_padded_pair_set
        from gnn_recsys_tpu.retrieval.recs import get_recs
        import jax.numpy as jnp

        item_col = ColumnConfig().item_id(fixed.item_id_type)

        user_ids = np.unique(np.asarray(gd.ground_truth_test[0]))[
            : fixed.num_choices * 4
        ]
        if len(user_ids):
            ab_set = build_padded_pair_set(
                already[0], already[1], num_src=gd.num_nodes["user"]
            )
            recs_arr = np.asarray(
                get_recs(h["user"], h["item"],
                         jnp.asarray(user_ids, jnp.int32), fixed.k,
                         already_bought=ab_set,
                         score_fn=model_score_fn(model.pred, state.params))
            )
            recs_dict = {int(u): row.tolist()
                         for u, row in zip(user_ids, recs_arr)}
            gt_dict = {}
            for u, i in zip(*gd.ground_truth_test):
                gt_dict.setdefault(int(u), []).append(int(i))
            explore_recs(
                recs_dict, gd.user_item_train_grouped, gd.item_feat_df,
                gd.pdt_id, gd.ctm_id, ground_truth=gt_dict,
                num_choices=fixed.num_choices,
                item_id_type=item_col,
            )
            if gd.item_feat_df is not None:
                check_coverage(gd.user_item_train_grouped, gd.item_feat_df,
                               gd.pdt_id, recs_dict, item_id_type=item_col)
        if "sport" in g.ntypes and gd.sport_feat_df is not None and len(
            gd.sport_feat_df
        ):
            h_sport = infer_embeddings(
                model, state.params, g, features, mode=fixed.inference_mode,
                node_batch_size=fixed.node_batch_size, ntypes=("sport",),
            )["sport"]
            explore_sports(np.asarray(h_sport), gd.sport_feat_df, gd.spt_id,
                           num_choices=fixed.num_choices)

    if plots_dir is not None:
        viz = {
            "train_loss_list": history["train_loss"],
            "loss_list": history["valid_loss"],
            "val_recall_list": history["recall"],
        }
        hp_str = ", ".join(
            f"{k}={v}" for k, v in dataclasses.asdict(hyper).items()
        )
        plot_train_loss(hp_str, viz, out_dir=plots_dir)

    return TrialResult(
        recall=recall,
        precision=precision,
        coverage=coverage,
        recall_purchase=recall_purchase,
        history=history,
        train_time_s=time.perf_counter() - t0,
        saved_to=saved_to,
        inference_recall=inference_recall,
        inference_recall_all_users=inference_recall_all,
    )
