"""Temporal train/validation split over the built graph.

Re-implements the reference ``train_valid_split``
(``/root/reference/src/sampling.py:5-114``) on the array-backed graph:

  * validation eids = the most recent ``valid_size`` fraction of each
    training etype's edges (edges are time-ordered by the builder);
  * the train graph is the full graph with validation edges AND their
    reverses removed (reverse relations share edge ids by builder
    invariant);
  * optional recency subsampling: keep only the most recent
    ``purchases_sample`` / ``clicks_sample`` fraction of train+valid eids;
  * optional ``remove_train_eids`` (reference ``src/sampling.py:84-86`` —
    note the reference's loop applies it only to the last etype; here it
    applies to every training etype, which is the documented intent);
  * a random ``subtrain_size`` sample of training users with their edges
    as a subtrain ground truth for train-set metrics;
  * test node ids = unique test users + ALL item ids.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np

from gnn_recsys_tpu.config import FixedParams
from gnn_recsys_tpu.graph.hetero import CanonicalEtype, HeteroGraph, remove_edges


@dataclasses.dataclass
class TrainValSplit:
    train_graph: HeteroGraph
    train_eids: Dict[CanonicalEtype, np.ndarray]  # into train_graph
    valid_eids: Dict[CanonicalEtype, np.ndarray]  # into the FULL graph
    subtrain_uids: np.ndarray
    valid_uids: np.ndarray
    test_uids: np.ndarray
    all_iids: np.ndarray
    ground_truth_subtrain: Tuple[np.ndarray, np.ndarray]
    ground_truth_valid: Tuple[np.ndarray, np.ndarray]
    all_eids: Dict[CanonicalEtype, np.ndarray]


def train_valid_split(
    full_graph: HeteroGraph,
    ground_truth_test: Tuple[np.ndarray, np.ndarray],
    fixed_params: FixedParams,
    clicks_sample: float = 1.0,
    purchases_sample: float = 1.0,
    max_fanout: Optional[int] = None,
    seed: int = 11,
) -> TrainValSplit:
    np.random.seed(seed)
    fp = fixed_params
    etypes = fp.train_etypes
    reverse = fp.reverse_etype

    all_eids: Dict[CanonicalEtype, np.ndarray] = {}
    valid_eids: Dict[CanonicalEtype, np.ndarray] = {}
    valid_u_all, valid_i_all = [], []
    for et in etypes:
        e = full_graph.num_edges(et)
        eids = np.arange(e)
        v = eids[int(e * (1 - fp.valid_size)):]
        all_eids[et] = eids
        valid_eids[et] = v
        src = np.asarray(full_graph.rels[et].src)[v]
        dst = np.asarray(full_graph.rels[et].dst)[v]
        valid_u_all.extend(src.tolist())
        valid_i_all.extend(dst.tolist())
    ground_truth_valid = (np.asarray(valid_u_all), np.asarray(valid_i_all))
    valid_uids = np.unique(valid_u_all)

    removals: Dict[CanonicalEtype, np.ndarray] = {}
    for et in etypes:
        removals[et] = valid_eids[et]
        removals[reverse[et]] = valid_eids[et]
    train_graph = remove_edges(full_graph, removals, max_fanout=max_fanout)
    train_eids = {
        et: np.arange(train_graph.num_edges(et)) for et in etypes
    }

    samples = {
        ("user", "buys", "item"): purchases_sample,
        ("user", "clicks", "item"): clicks_sample,
    }
    for et, frac in samples.items():
        if frac != 1 and et in train_eids:
            e = train_eids[et]
            train_eids[et] = e[int(len(e) * (1 - frac)):]
            v = valid_eids[et]
            valid_eids[et] = v[int(len(v) * (1 - frac)):]

    if fp.remove_train_eids:
        removals2 = {}
        for et in etypes:
            removals2[et] = train_eids[et]
            removals2[reverse[et]] = train_eids[et]
        train_graph = remove_edges(
            train_graph, removals2, max_fanout=max_fanout
        )

    # Subtrain user sample for train-set metrics (sampling.py:88-106).
    first_et = etypes[0]
    t_src = np.asarray(train_graph.rels[first_et].src)[train_eids[first_et]]
    unique_train_uids = np.unique(t_src)
    subtrain_uids = np.random.choice(
        unique_train_uids,
        int(len(unique_train_uids) * fp.subtrain_size),
        replace=False,
    )
    sub_set = set(subtrain_uids.tolist())
    sub_u_all, sub_i_all = [], []
    for et in train_eids:
        src = np.asarray(train_graph.rels[et].src)[train_eids[et]]
        dst = np.asarray(train_graph.rels[et].dst)[train_eids[et]]
        keep = np.asarray([u in sub_set for u in src.tolist()], dtype=bool)
        sub_u_all.extend(src[keep].tolist())
        sub_i_all.extend(dst[keep].tolist())
    ground_truth_subtrain = (np.asarray(sub_u_all), np.asarray(sub_i_all))
    subtrain_uids = np.unique(sub_u_all)

    test_uids = np.unique(np.asarray(ground_truth_test[0]))
    all_iids = np.arange(full_graph.num_nodes("item"))

    return TrainValSplit(
        train_graph=train_graph,
        train_eids=train_eids,
        valid_eids=valid_eids,
        subtrain_uids=subtrain_uids,
        valid_uids=valid_uids,
        test_uids=test_uids,
        all_iids=all_iids,
        ground_truth_subtrain=ground_truth_subtrain,
        ground_truth_valid=ground_truth_valid,
        all_eids=all_eids,
    )
