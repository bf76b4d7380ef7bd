"""Qualitative evaluation: example recommendations, similar sports,
demographic coverage.

Re-implements the reference's ``src/evaluation.py:52-226`` on this
framework's data structures: given recommendations (node-id lists per
user), the id maps and the raw feature/interaction dataframes, print what
random users bought/clicked vs. what was recommended (``explore_recs``),
the most similar sports by embedding cosine (``explore_sports``), and the
share of junior/male/female/eco items among recommendations vs. actual
transactions (``check_coverage``).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
import pandas as pd

from gnn_recsys_tpu.config import ColumnConfig
from gnn_recsys_tpu.models.layers import l2_normalize


def explore_recs(
    recs: Dict[int, Sequence[int]],
    user_item_train: pd.DataFrame,
    item_info_df: Optional[pd.DataFrame],
    pdt_id: pd.DataFrame,
    ctm_id: pd.DataFrame,
    ground_truth: Optional[Dict[int, Sequence[int]]] = None,
    num_choices: int = 10,
    item_id_type: Optional[str] = None,
    columns: Optional[ColumnConfig] = None,
    seed: int = 11,
    print_fn=print,
) -> None:
    """Print bought/recommended/ground-truth items for random users
    (reference src/evaluation.py:52-149)."""
    c = columns or ColumnConfig()
    item_col = item_id_type or c.specific_item_id
    rng = np.random.default_rng(seed)
    uids = list(recs.keys())
    chosen = rng.choice(uids, size=min(num_choices, len(uids)), replace=False)

    item_map = dict(zip(pdt_id["pdt_new_id"], pdt_id[item_col]))
    user_map = dict(zip(ctm_id["ctm_new_id"], ctm_id[c.ctm_id]))

    def describe(item_node_ids):
        ext = [item_map.get(int(i), f"<{int(i)}>") for i in item_node_ids]
        if item_info_df is not None and item_col in item_info_df.columns:
            info = item_info_df.set_index(item_col)
            out = []
            for e in ext:
                if e in info.index:
                    row = info.loc[e]
                    if isinstance(row, pd.DataFrame):
                        row = row.iloc[0]
                    out.append(f"{e} {dict(row.head(4))}")
                else:
                    out.append(str(e))
            return out
        return ext

    for u in chosen:
        print_fn(f"\nUser {user_map.get(int(u), u)} (node {int(u)}):")
        hist = user_item_train[
            user_item_train.get("ctm_new_id", pd.Series(dtype=int)) == u
        ]
        if len(hist):
            bought = hist[hist[c.buy] == 1]["pdt_new_id"].tolist()
            clicked = hist[hist[c.buy] == 0]["pdt_new_id"].tolist()
            print_fn(f"  bought:      {describe(bought[:8])}")
            print_fn(f"  clicked:     {describe(clicked[:8])}")
        # Drop the -1 "no recommendation" sentinel (hub users who already
        # bought nearly the whole catalog).
        rec_row = [r for r in list(recs[u]) if int(r) >= 0]
        print_fn(f"  recommended: {describe(rec_row[:10])}")
        if ground_truth is not None and u in ground_truth:
            print_fn(f"  ground truth:{describe(list(ground_truth[u])[:8])}")


def explore_sports(
    sport_emb: np.ndarray,
    sport_feat_df: pd.DataFrame,
    spt_id: pd.DataFrame,
    num_choices: int = 10,
    top: int = 5,
    seed: int = 11,
    columns: Optional[ColumnConfig] = None,
    print_fn=print,
) -> Dict[str, list]:
    """Top similar sports by embedding cosine (reference
    src/evaluation.py:152-176). Returns {sport_name: [similar names]}."""
    c = columns or ColumnConfig()
    emb = np.asarray(l2_normalize(np.asarray(sport_emb, dtype=np.float32)))
    sims = emb @ emb.T
    name_col = [col for col in sport_feat_df.columns if col != c.spt_id][0]
    id_to_name = dict(zip(spt_id["spt_new_id"], spt_id[c.spt_id]))
    ext_to_name = dict(zip(sport_feat_df[c.spt_id], sport_feat_df[name_col]))

    rng = np.random.default_rng(seed)
    n = emb.shape[0]
    chosen = rng.choice(n, size=min(num_choices, n), replace=False)
    out = {}
    for s in chosen:
        order = np.argsort(-sims[s])
        similar = [x for x in order if x != s][:top]

        def nm(x):
            e = id_to_name.get(int(x), x)
            return str(ext_to_name.get(e, e))

        out[nm(s)] = [nm(x) for x in similar]
        print_fn(f"{nm(s)} -> {out[nm(s)]}")
    return out


def check_coverage(
    user_item_train: pd.DataFrame,
    item_feat_df: pd.DataFrame,
    pdt_id: pd.DataFrame,
    recs: Dict[int, Sequence[int]],
    item_id_type: Optional[str] = None,
    columns: Optional[ColumnConfig] = None,
    print_fn=print,
) -> Dict[str, Dict[str, float]]:
    """Demographic shares of recommendations vs transactions
    (reference src/evaluation.py:179-226).

    Returns {'transactions': {...}, 'recommendations': {...}} with the
    share of junior / male / female / eco items (and the generic share =
    items with no such flags).
    """
    c = columns or ColumnConfig()
    item_col = item_id_type or c.specific_item_id
    flags = ["is_junior", "is_male", "is_female", "eco_design"]
    info = item_feat_df.drop_duplicates(subset=[item_col]).set_index(item_col)

    def shares(item_ext_ids):
        rows = info.reindex(item_ext_ids)
        total = max(len(item_ext_ids), 1)
        out = {}
        for f in flags:
            out[f] = float(rows[f].fillna(0).sum()) / total if f in rows else 0.0
        known = rows[flags].fillna(0).sum(axis=1) if set(flags) <= set(
            rows.columns
        ) else pd.Series(0, index=rows.index)
        out["generic"] = float((known == 0).sum()) / total
        return out

    item_map = dict(zip(pdt_id["pdt_new_id"], pdt_id[item_col]))
    tx_items = [
        item_map.get(int(i), None)
        for i in user_item_train.get("pdt_new_id", pd.Series(dtype=int))
    ]
    tx_items = [i for i in tx_items if i is not None]
    rec_items = [
        item_map.get(int(i), None) for row in recs.values() for i in row
    ]
    rec_items = [i for i in rec_items if i is not None]

    result = {
        "transactions": shares(tx_items),
        "recommendations": shares(rec_items),
    }
    for key, val in result.items():
        print_fn(f"{key}: " + ", ".join(f"{k}={v:.3f}" for k, v in val.items()))
    return result
