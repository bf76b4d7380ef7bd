"""Graph container tests: padded CSC round-trips vs dense adjacency."""

import numpy as np
import pytest

from gnn_recsys_tpu.graph.hetero import (
    build_hetero_graph,
    coo_to_padded_csc,
    remove_edges,
)


def dense_adj(src, dst, num_src, num_dst):
    a = np.zeros((num_src, num_dst), dtype=np.int64)
    for s, d in zip(src, dst):
        a[s, d] += 1
    return a


def test_csc_round_trip_random():
    rng = np.random.default_rng(0)
    num_src, num_dst, e = 50, 37, 400
    src = rng.integers(0, num_src, e).astype(np.int32)
    dst = rng.integers(0, num_dst, e).astype(np.int32)
    nbr, nbr_eid, nbr_mask, deg = coo_to_padded_csc(src, dst, num_dst)

    assert deg.tolist() == np.bincount(dst, minlength=num_dst).tolist()
    assert (nbr_mask.sum(axis=1) == deg).all()
    # Reconstruct adjacency from the padded table.
    recon = np.zeros((num_src, num_dst), dtype=np.int64)
    for d in range(num_dst):
        for k_ in range(nbr.shape[1]):
            if nbr_mask[d, k_]:
                recon[nbr[d, k_], d] += 1
    assert (recon == dense_adj(src, dst, num_src, num_dst)).all()
    # eids point back at the right COO entries.
    rows, slots = np.nonzero(nbr_mask)
    eids = nbr_eid[rows, slots]
    assert (dst[eids] == rows).all()
    assert (src[eids] == nbr[rows, slots]).all()


def test_csc_slot_order_is_edge_order():
    # Slots within a destination row follow edge-id (insertion/time) order.
    src = np.array([3, 1, 4, 1, 5], dtype=np.int32)
    dst = np.array([0, 0, 0, 1, 0], dtype=np.int32)
    nbr, nbr_eid, nbr_mask, deg = coo_to_padded_csc(src, dst, num_dst=2)
    assert nbr[0, :4].tolist() == [3, 1, 4, 5]
    assert nbr_eid[0, :4].tolist() == [0, 1, 2, 4]
    assert deg.tolist() == [4, 1]


def test_csc_fanout_cap_keeps_last_edges():
    src = np.arange(10, dtype=np.int32)
    dst = np.zeros(10, dtype=np.int32)
    nbr, nbr_eid, nbr_mask, deg = coo_to_padded_csc(
        src, dst, num_dst=1, max_fanout=4, fanout_multiple=4
    )
    assert nbr.shape[1] == 4
    assert deg.tolist() == [4]
    assert nbr[0].tolist() == [6, 7, 8, 9]  # most recent kept


def test_zero_degree_rows():
    src = np.array([0, 1], dtype=np.int32)
    dst = np.array([2, 2], dtype=np.int32)
    nbr, nbr_eid, nbr_mask, deg = coo_to_padded_csc(src, dst, num_dst=4)
    assert deg.tolist() == [0, 0, 2, 0]
    assert not nbr_mask[[0, 1, 3]].any()


def test_build_and_remove_edges():
    src = np.array([0, 1, 2, 0], dtype=np.int32)
    dst = np.array([1, 1, 0, 2], dtype=np.int32)
    g = build_hetero_graph(
        {("user", "buys", "item"): (src, dst)},
        {"user": 3, "item": 3},
        edata={("user", "buys", "item"): {"recency": np.arange(4.0)}},
    )
    assert g.num_edges(("user", "buys", "item")) == 4
    g2 = remove_edges(g, {("user", "buys", "item"): np.array([1, 3])})
    rel = g2.rels[("user", "buys", "item")]
    assert rel.num_edges == 2
    assert np.asarray(rel.src).tolist() == [0, 2]
    assert np.asarray(rel.edata["recency"]).tolist() == [0.0, 2.0]
    # original untouched
    assert g.num_edges(("user", "buys", "item")) == 4


def test_metagraph_queries():
    g = build_hetero_graph(
        {
            ("user", "buys", "item"): (np.array([0]), np.array([0])),
            ("item", "bought-by", "user"): (np.array([0]), np.array([0])),
        },
        {"user": 2, "item": 2},
    )
    assert g.etypes_into("item") == (("user", "buys", "item"),)
    assert g.etypes_from("item") == (("item", "bought-by", "user"),)
    assert set(g.ntypes) == {"user", "item"}
