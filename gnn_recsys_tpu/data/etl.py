"""Dataframe ETL -> device-resident HeteroGraph.

Re-implements the reference's graph-construction pipeline with identical
semantics but emitting this framework's array schema instead of a DGL
object:

  * ``format_dfs``  (reference ``src/builder.py:12-179``): time-window
    filters for purchases/clicks/item lifespan, random user subsampling,
    SPECIFIC->GENERAL item-id remap, item-sport dedup;
  * ``create_ids``  (``src/builder.py:182-227``): contiguous node ids —
    users from train interactions, train items first with unseen catalog
    items appended at the end, sports from the union of sport files;
  * ``df_to_adjacency_list``  (``src/builder.py:230-374``): id joins,
    duplicates policy (keep_all / keep_last / count_occurrence with
    occurrence counts as edge weights), clicks/purchases splits, test
    ground-truth pairs;
  * ``import_features``  (``src/builder.py:386-493``): zero-initialized
    scatter-filled dense feature matrices (user 2-dim, item 4-dim — zeros
    under GENERAL ids — sport one-hot) and item popularity scores;
  * ``GraphData``  (reference ``DataLoader`` + ``assign_graph_features``,
    ``src/utils_data.py:119-317``): orchestrates the above, assembles the
    canonical-etype schema (4 user-item etypes with ``discern_clicks``,
    6 sport etypes with ``include_sport``) and builds the
    :class:`~gnn_recsys_tpu.graph.hetero.HeteroGraph` with recency /
    occurrence edge features.

Builder invariant relied on by training: every reverse relation is built
from the SAME row order as its forward relation, so forward and reverse
edges share edge ids (used for reverse-edge exclusion and shared edata).
"""

from __future__ import annotations

import dataclasses
from datetime import datetime, timedelta
from typing import Dict, Optional, Tuple

import numpy as np
import pandas as pd

from gnn_recsys_tpu.config import (
    GENERAL,
    SPECIFIC,
    ColumnConfig,
    DataPaths,
    FixedParams,
)
from gnn_recsys_tpu.data.io import read_data
from gnn_recsys_tpu.graph.hetero import HeteroGraph, build_hetero_graph

MAX_DAYS = 710  # reference's "no filter" sentinel (src/builder.py:97-113)


def _limit_date(df: pd.DataFrame, date_col: str, days: int) -> str:
    most_recent = datetime.strptime(max(df[date_col]), "%Y-%m-%d")
    return datetime.strftime(most_recent - timedelta(days=int(days)), "%Y-%m-%d")


def _as_df(path_or_df):
    if isinstance(path_or_df, pd.DataFrame):
        return path_or_df.copy()
    if isinstance(path_or_df, str):
        return read_data(path_or_df)
    raise TypeError(f"Type of {path_or_df} not recognized.")


def format_dfs(
    train,
    test,
    item_sport,
    user_sport,
    sport_sportg,
    item_feat,
    user_feat,
    sport_feat,
    sport_onehot,
    remove: float = 0.0,
    item_id_type: str = SPECIFIC,
    days_of_purchases: int = MAX_DAYS,
    days_of_clicks: int = MAX_DAYS,
    lifespan_of_items: int = MAX_DAYS,
    report_model_coverage: bool = False,
    columns: Optional[ColumnConfig] = None,
    print_fn=print,
):
    """Time-window + subsampling preprocessing (src/builder.py:12-179)."""
    c = columns or ColumnConfig()
    np.random.seed(11)
    user_item_train = _as_df(train)
    user_item_test = _as_df(test)
    item_feat_df = _as_df(item_feat)
    user_feat_df = _as_df(user_feat)
    sport_feat_df = _as_df(sport_feat)
    sport_onehot_df = _as_df(sport_onehot)

    item_list = None
    if days_of_purchases < MAX_DAYS:
        lim = _limit_date(user_item_train, c.hit_date, days_of_purchases)
        user_item_train = user_item_train[
            (user_item_train[c.hit_date] >= lim) | (user_item_train[c.buy] == 0)
        ]
    if days_of_clicks < MAX_DAYS:
        lim = _limit_date(user_item_train, c.hit_date, days_of_clicks)
        user_item_train = user_item_train[
            (user_item_train[c.hit_date] >= lim) | (user_item_train[c.buy] == 1)
        ]
    if lifespan_of_items < days_of_purchases:
        lim = _limit_date(user_item_train, c.hit_date, lifespan_of_items)
        item_list = user_item_train[user_item_train[c.hit_date] >= lim][
            c.specific_item_id
        ].unique()
        user_item_train = user_item_train[
            user_item_train[c.specific_item_id].isin(item_list)
        ]

    if remove > 0:
        ctm_list = user_item_train[c.ctm_id].unique()
        np.random.shuffle(ctm_list)
        ctm_list = ctm_list[: int(len(ctm_list) * (1 - remove))]
        user_item_train = user_item_train[
            user_item_train[c.ctm_id].isin(ctm_list)
        ]
        user_item_test = user_item_test[user_item_test[c.ctm_id].isin(ctm_list)]
    else:
        # No user is only in the test set (src/builder.py:131-133).
        user_item_test = user_item_test[
            user_item_test[c.ctm_id].isin(user_item_train[c.ctm_id].unique())
        ]

    if item_id_type == GENERAL:
        mapping = item_feat_df[
            [c.specific_item_id, c.general_item_id]
        ].drop_duplicates()
        user_item_train = user_item_train.merge(
            mapping, how="left", on=c.specific_item_id
        )
        user_item_test = user_item_test.merge(
            mapping, how="left", on=c.specific_item_id
        )
        assert user_item_train[c.general_item_id].isna().sum() == 0
        assert user_item_test[c.general_item_id].isna().sum() == 0

    item_sport_interaction = _as_df(item_sport)
    if item_list is not None:
        item_sport_interaction = item_sport_interaction[
            item_sport_interaction[c.specific_item_id].isin(item_list)
        ]
    if item_id_type == GENERAL:
        item_sport_interaction = item_sport_interaction.merge(
            item_feat_df[[c.specific_item_id, c.general_item_id]],
            how="left",
            on=c.specific_item_id,
        )
    item_sport_interaction = item_sport_interaction.drop_duplicates()

    user_sport_interaction = _as_df(user_sport)
    if remove > 0:
        user_sport_interaction = user_sport_interaction[
            user_sport_interaction[c.ctm_id].isin(ctm_list)
        ]

    sport_sportg_interaction = _as_df(sport_sportg)

    if report_model_coverage:
        # How many test users the chosen time-window parameters leave
        # coverable (reference src/builder.py:167-176): users with no train
        # interactions at all, and of those, users with no sport edges
        # either (truly cold — the model cannot embed them from data).
        train_users = set(user_item_train[c.ctm_id].unique())
        test_users = user_item_test[c.ctm_id].unique()
        sport_users = set(user_sport_interaction[c.ctm_id].unique())
        no_interactions = [u for u in test_users if u not in train_users]
        print_fn(
            f"There are {len(no_interactions)} users with no interactions"
        )
        covered = train_users | sport_users
        cold = [u for u in test_users if u not in covered]
        print_fn(f"and {len(cold)} with also no sports associated")
        print_fn(f"out of {len(test_users)}")

    return (
        user_item_train,
        user_item_test,
        item_sport_interaction,
        user_sport_interaction,
        sport_sportg_interaction,
        item_feat_df,
        user_feat_df,
        sport_feat_df,
        sport_onehot_df,
    )


def create_ids(
    user_item_train: pd.DataFrame,
    user_sport_interaction: pd.DataFrame,
    sport_sportg_interaction: pd.DataFrame,
    item_feat_df: pd.DataFrame,
    item_id_type: str = SPECIFIC,
    columns: Optional[ColumnConfig] = None,
) -> Tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Contiguous node-id mapping tables (src/builder.py:182-227):
    users in train-interaction order; train items first, unseen catalog
    items appended at the end; sports = sorted union of all sport ids."""
    c = columns or ColumnConfig()
    item_col = c.item_id(item_id_type)

    ctm_id = pd.DataFrame(
        user_item_train[c.ctm_id].unique(), columns=[c.ctm_id]
    )
    ctm_id["ctm_new_id"] = ctm_id.index

    train_pdt = user_item_train[item_col].unique().tolist()
    all_pdt = item_feat_df[item_col].unique().tolist()
    train_set = set(train_pdt)
    unseen = [p for p in all_pdt if p not in train_set]
    pdt_id = pd.DataFrame(train_pdt + unseen, columns=[item_col])
    pdt_id["pdt_new_id"] = pdt_id.index

    unique_sports = np.append(
        sport_sportg_interaction[c.sports_id].unique(),
        sport_sportg_interaction[c.sportsgroup_id].unique(),
    )
    unique_sports = np.unique(
        np.append(unique_sports, user_sport_interaction[c.spt_id].unique())
    )
    spt_id = pd.DataFrame(unique_sports, columns=[c.spt_id])
    spt_id["spt_new_id"] = spt_id.index
    return ctm_id, pdt_id, spt_id


def df_to_adjacency_list(
    user_item_train: pd.DataFrame,
    user_item_test: pd.DataFrame,
    item_sport_interaction: pd.DataFrame,
    user_sport_interaction: pd.DataFrame,
    sport_sportg_interaction: pd.DataFrame,
    ctm_id: pd.DataFrame,
    pdt_id: pd.DataFrame,
    spt_id: pd.DataFrame,
    item_id_type: str = SPECIFIC,
    discern_clicks: bool = False,
    duplicates: str = "keep_all",
    columns: Optional[ColumnConfig] = None,
):
    """Id joins + duplicates policy + per-etype src/dst arrays
    (src/builder.py:230-374)."""
    c = columns or ColumnConfig()
    item_col = c.item_id(item_id_type)
    adjacency_dict = {}

    user_item_train = user_item_train.merge(ctm_id, how="left", on=c.ctm_id)
    user_item_train = user_item_train.merge(pdt_id, how="left", on=item_col)

    if duplicates in ("keep_last", "count_occurrence"):
        grouped = (
            user_item_train.groupby([c.buy, "ctm_new_id", "pdt_new_id"])[
                c.specific_item_id
            ]
            .count()
            .reset_index()
        )
        grouped.columns = [c.buy, "ctm_new_id", "pdt_new_id", "num_interaction"]
        user_item_train = user_item_train.drop_duplicates(
            subset=[c.buy, "ctm_new_id", "pdt_new_id"], keep="last"
        )
        user_item_train = user_item_train.sort_values(
            by=[c.buy, "ctm_new_id", "pdt_new_id"], ignore_index=True
        )
        assert len(user_item_train) == len(grouped)
        user_item_train["num_interaction"] = grouped.num_interaction.values
        user_item_train = user_item_train.sort_values(
            by=c.hit_timestamp, ignore_index=True
        )
        if discern_clicks:
            adjacency_dict["clicks_num"] = user_item_train[
                user_item_train[c.buy] == 0
            ].num_interaction.values
            adjacency_dict["purchases_num"] = user_item_train[
                user_item_train[c.buy] == 1
            ].num_interaction.values
        else:
            adjacency_dict["user_item_num"] = (
                user_item_train.num_interaction.values
            )

    if discern_clicks:
        clicks = user_item_train[user_item_train[c.buy] == 0]
        purchases = user_item_train[user_item_train[c.buy] == 1]
        adjacency_dict["clicks_src"] = clicks.ctm_new_id.values
        adjacency_dict["clicks_dst"] = clicks.pdt_new_id.values
        adjacency_dict["purchases_src"] = purchases.ctm_new_id.values
        adjacency_dict["purchases_dst"] = purchases.pdt_new_id.values
    else:
        adjacency_dict["user_item_src"] = user_item_train.ctm_new_id.values
        adjacency_dict["user_item_dst"] = user_item_train.pdt_new_id.values

    user_item_test = user_item_test.merge(ctm_id, how="left", on=c.ctm_id)
    user_item_test = user_item_test.merge(pdt_id, how="left", on=item_col)
    buys_test = user_item_test[user_item_test[c.buy] == 1]
    ground_truth_purchase_test = (
        buys_test.ctm_new_id.values,
        buys_test.pdt_new_id.values,
    )
    ground_truth_test = (
        user_item_test.ctm_new_id.values,
        user_item_test.pdt_new_id.values,
    )

    item_sport_interaction = item_sport_interaction.merge(
        spt_id, how="left", on=c.spt_id
    ).merge(pdt_id, how="left", on=item_col)
    item_sport_interaction = item_sport_interaction.dropna(
        subset=["spt_new_id", "pdt_new_id"]
    )
    adjacency_dict["item_sport_src"] = item_sport_interaction.pdt_new_id.values.astype(
        np.int64
    )
    adjacency_dict["item_sport_dst"] = item_sport_interaction.spt_new_id.values.astype(
        np.int64
    )

    user_sport_interaction = user_sport_interaction.merge(
        spt_id, how="left", on=c.spt_id
    ).merge(ctm_id, how="left", on=c.ctm_id)
    user_sport_interaction = user_sport_interaction.dropna(
        subset=["spt_new_id", "ctm_new_id"]
    )
    adjacency_dict["user_sport_src"] = user_sport_interaction.ctm_new_id.values.astype(
        np.int64
    )
    adjacency_dict["user_sport_dst"] = user_sport_interaction.spt_new_id.values.astype(
        np.int64
    )

    ss = sport_sportg_interaction.merge(
        spt_id, how="left", left_on=c.sports_id, right_on=c.spt_id
    ).merge(spt_id, how="left", left_on=c.sportsgroup_id, right_on=c.spt_id)
    adjacency_dict["sport_sportg_src"] = ss.spt_new_id_x.values
    adjacency_dict["sport_sportg_dst"] = ss.spt_new_id_y.values

    return (
        adjacency_dict,
        ground_truth_test,
        ground_truth_purchase_test,
        user_item_train,
    )


def import_features(
    num_nodes: Dict[str, int],
    user_feat_df: pd.DataFrame,
    item_feat_df: pd.DataFrame,
    sport_onehot_df: Optional[pd.DataFrame],
    ctm_id: pd.DataFrame,
    pdt_id: pd.DataFrame,
    spt_id: pd.DataFrame,
    user_item_train: pd.DataFrame,
    get_popularity: bool = False,
    num_days_pop: int = 0,
    item_id_type: str = SPECIFIC,
    columns: Optional[ColumnConfig] = None,
) -> Dict[str, np.ndarray]:
    """Dense zero-initialized, scatter-filled feature matrices
    (src/builder.py:386-493)."""
    c = columns or ColumnConfig()
    item_col = c.item_id(item_id_type)
    out: Dict[str, np.ndarray] = {}

    uf = user_feat_df.merge(ctm_id, how="inner", on=c.ctm_id)
    ids = uf.ctm_new_id.values.astype(int)
    feats = np.stack((uf.is_male.values, uf.is_female.values), axis=1)
    user_feat = np.zeros((num_nodes["user"], 2), dtype=np.float32)
    user_feat[ids] = feats
    out["user_feat"] = user_feat

    if item_id_type == SPECIFIC:
        itf = item_feat_df.merge(pdt_id, how="left", on=item_col)
        itf = itf[itf.pdt_new_id < num_nodes["item"]]
        ids = itf.pdt_new_id.values.astype(int)
        feats = np.stack(
            (
                itf.is_junior.values,
                itf.is_male.values,
                itf.is_female.values,
                itf.eco_design.values,
            ),
            axis=1,
        )
        item_feat = np.zeros((num_nodes["item"], 4), dtype=np.float32)
        item_feat[ids] = feats
    elif item_id_type == GENERAL:
        # General ids have no per-SKU features (src/builder.py:454-455).
        item_feat = np.zeros((num_nodes["item"], 4), dtype=np.float32)
    else:
        raise KeyError(f"Item ID {item_id_type} not recognized.")
    out["item_feat"] = item_feat

    if sport_onehot_df is not None and "sport" in num_nodes:
        sf = sport_onehot_df.merge(spt_id, how="inner", on=c.spt_id)
        sf = sf.sort_values(by="spt_new_id")
        feats = sf.drop(labels=[c.spt_id, "spt_new_id"], axis=1).values
        assert feats.shape[0] == num_nodes["sport"]
        out["sport_feat"] = feats.astype(np.float32)

    if get_popularity:
        pop = np.zeros((num_nodes["item"], 1), dtype=np.float32)
        pop_df = user_item_train
        if "pdt_new_id" not in pop_df.columns:
            pop_df = pop_df.merge(pdt_id, how="left", on=item_col)
        lim = _limit_date(pop_df, c.hit_date, num_days_pop)
        pop_df = pop_df[pop_df[c.hit_date] >= lim]
        counts = pop_df.pdt_new_id.value_counts().sort_index()
        scores = counts / counts.sum()
        pop[counts.index.values.astype(int), 0] = scores.values
        out["item_pop"] = pop
    return out


@dataclasses.dataclass
class GraphData:
    """ETL output bundle: the graph, id maps, and ground truths
    (the reference's ``DataLoader`` object, src/utils_data.py:119-238)."""

    graph: HeteroGraph
    ctm_id: pd.DataFrame
    pdt_id: pd.DataFrame
    spt_id: pd.DataFrame
    ground_truth_test: Tuple[np.ndarray, np.ndarray]
    ground_truth_purchase_test: Tuple[np.ndarray, np.ndarray]
    num_nodes: Dict[str, int]
    adjacency_dict: Dict[str, np.ndarray]
    user_item_train_grouped: pd.DataFrame
    item_feat_df: Optional[pd.DataFrame] = None
    sport_feat_df: Optional[pd.DataFrame] = None

    @classmethod
    def from_dataframes(
        cls,
        fixed_params: FixedParams,
        train,
        test,
        item_sport=None,
        user_sport=None,
        sport_sportg=None,
        item_feat=None,
        user_feat=None,
        sport_feat=None,
        sport_onehot=None,
        use_recency: bool = False,
        use_popularity: bool = False,
        days_popularity: int = 0,
        columns: Optional[ColumnConfig] = None,
        max_fanout: Optional[int] = None,
    ) -> "GraphData":
        c = columns or ColumnConfig()
        fp = fixed_params
        include_sport = fp.include_sport and item_sport is not None

        # Matches the reference file format: item-sport files carry the
        # SPECIFIC id only; the GENERAL id is merged in by format_dfs.
        empty_item_sport = pd.DataFrame(
            {c.specific_item_id: [], c.spt_id: []}
        )
        empty_user_sport = pd.DataFrame({c.ctm_id: [], c.spt_id: []})
        empty_sport_sportg = pd.DataFrame(
            {c.sports_id: [], c.sportsgroup_id: [], c.spt_id: []}
        )
        empty_sport_feat = pd.DataFrame({c.spt_id: []})
        (
            user_item_train,
            user_item_test,
            item_sport_interaction,
            user_sport_interaction,
            sport_sportg_interaction,
            item_feat_df,
            user_feat_df,
            sport_feat_df,
            sport_onehot_df,
        ) = format_dfs(
            train,
            test,
            item_sport if include_sport else empty_item_sport,
            user_sport if include_sport else empty_user_sport,
            sport_sportg if include_sport else empty_sport_sportg,
            item_feat,
            user_feat,
            sport_feat if include_sport else empty_sport_feat,
            sport_onehot if include_sport else empty_sport_feat,
            remove=fp.remove,
            item_id_type=fp.item_id_type,
            days_of_purchases=fp.days_of_purchases,
            days_of_clicks=fp.days_of_clicks,
            lifespan_of_items=fp.lifespan_of_items,
            report_model_coverage=fp.report_model_coverage,
            columns=c,
        )

        ctm_id, pdt_id, spt_id = create_ids(
            user_item_train,
            user_sport_interaction,
            sport_sportg_interaction,
            item_feat_df,
            item_id_type=fp.item_id_type,
            columns=c,
        )

        (
            adjacency_dict,
            ground_truth_test,
            ground_truth_purchase_test,
            user_item_train_grouped,
        ) = df_to_adjacency_list(
            user_item_train,
            user_item_test,
            item_sport_interaction,
            user_sport_interaction,
            sport_sportg_interaction,
            ctm_id,
            pdt_id,
            spt_id,
            item_id_type=fp.item_id_type,
            discern_clicks=fp.discern_clicks,
            duplicates=fp.duplicates,
            columns=c,
        )

        num_nodes = {"user": len(ctm_id), "item": len(pdt_id)}
        if include_sport:
            num_nodes["sport"] = len(spt_id)

        a = adjacency_dict
        if fp.discern_clicks:
            schema = {
                ("user", "buys", "item"): (a["purchases_src"], a["purchases_dst"]),
                ("item", "bought-by", "user"): (a["purchases_dst"], a["purchases_src"]),
                ("user", "clicks", "item"): (a["clicks_src"], a["clicks_dst"]),
                ("item", "clicked-by", "user"): (a["clicks_dst"], a["clicks_src"]),
            }
        else:
            schema = {
                ("user", "buys", "item"): (a["user_item_src"], a["user_item_dst"]),
                ("item", "bought-by", "user"): (a["user_item_dst"], a["user_item_src"]),
            }
        if include_sport:
            schema.update(
                {
                    ("item", "utilized-for", "sport"): (a["item_sport_src"], a["item_sport_dst"]),
                    ("sport", "utilizes", "item"): (a["item_sport_dst"], a["item_sport_src"]),
                    ("user", "practices", "sport"): (a["user_sport_src"], a["user_sport_dst"]),
                    ("sport", "practiced-by", "user"): (a["user_sport_dst"], a["user_sport_src"]),
                    ("sport", "belongs-to", "sport"): (a["sport_sportg_src"], a["sport_sportg_dst"]),
                    ("sport", "includes", "sport"): (a["sport_sportg_dst"], a["sport_sportg_src"]),
                }
            )

        features = import_features(
            num_nodes,
            user_feat_df,
            item_feat_df,
            sport_onehot_df if include_sport else None,
            ctm_id,
            pdt_id,
            spt_id,
            user_item_train_grouped,
            get_popularity=use_popularity,
            num_days_pop=days_popularity,
            item_id_type=fp.item_id_type,
            columns=c,
        )
        ndata: Dict[str, Dict[str, np.ndarray]] = {
            "user": {"features": features["user_feat"]},
            "item": {"features": features["item_feat"]},
        }
        if "sport_feat" in features:
            ndata["sport"] = {"features": features["sport_feat"]}
        if use_popularity:
            ndata["item"]["popularity"] = features["item_pop"]

        # Edge features: recency (days since interaction, +1) and occurrence
        # counts — duplicated onto reverse etypes (src/utils_data.py:287-315).
        edata: Dict[Tuple[str, str, str], Dict[str, np.ndarray]] = {}
        df = user_item_train_grouped
        if use_recency:
            max_date = max(df[c.hit_date])
            recency = (
                pd.to_datetime(max_date) - pd.to_datetime(df[c.hit_date])
            ).dt.days.values + 1
            if fp.discern_clicks:
                rb = recency[df[c.buy].values == 1]
                rc = recency[df[c.buy].values == 0]
                for et in (("user", "buys", "item"), ("item", "bought-by", "user")):
                    edata.setdefault(et, {})["recency"] = rb
                for et in (("user", "clicks", "item"), ("item", "clicked-by", "user")):
                    edata.setdefault(et, {})["recency"] = rc
            else:
                for et in (("user", "buys", "item"), ("item", "bought-by", "user")):
                    edata.setdefault(et, {})["recency"] = recency
        if fp.duplicates == "count_occurrence":
            if fp.discern_clicks:
                for et in (("user", "buys", "item"), ("item", "bought-by", "user")):
                    edata.setdefault(et, {})["occurrence"] = a["purchases_num"]
                for et in (("user", "clicks", "item"), ("item", "clicked-by", "user")):
                    edata.setdefault(et, {})["occurrence"] = a["clicks_num"]
            else:
                for et in (("user", "buys", "item"), ("item", "bought-by", "user")):
                    edata.setdefault(et, {})["occurrence"] = a["user_item_num"]

        graph = build_hetero_graph(
            schema, num_nodes, edata=edata, ndata=ndata, max_fanout=max_fanout
        )
        return cls(
            graph=graph,
            ctm_id=ctm_id,
            pdt_id=pdt_id,
            spt_id=spt_id,
            ground_truth_test=ground_truth_test,
            ground_truth_purchase_test=ground_truth_purchase_test,
            num_nodes=num_nodes,
            adjacency_dict=a,
            user_item_train_grouped=user_item_train_grouped,
            item_feat_df=item_feat_df,
            sport_feat_df=sport_feat_df,
        )

    @classmethod
    def from_paths(
        cls,
        paths: DataPaths,
        fixed_params: FixedParams,
        **kwargs,
    ) -> "GraphData":
        return cls.from_dataframes(
            fixed_params,
            train=paths.train_path,
            test=paths.test_path,
            item_sport=paths.item_sport_path or None,
            user_sport=paths.user_sport_path or None,
            sport_sportg=paths.sport_sportg_path or None,
            item_feat=paths.item_feat_path,
            user_feat=paths.user_feat_path,
            sport_feat=paths.sport_feat_path or None,
            sport_onehot=paths.sport_onehot_path or None,
            **kwargs,
        )
