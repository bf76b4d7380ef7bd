"""Raw-data pre-splitting (reference ``presplit.py:10-84``, same semantics).

Filters users with fewer than ``num_min`` interactions, optionally drops
items absent from the feature file, splits temporally by ``test_size_days``
(or randomly when ``sort=False``), and keeps only train-set users in the
test set.
"""

from __future__ import annotations

from datetime import datetime, timedelta
from typing import Tuple

import numpy as np
import pandas as pd

from gnn_recsys_tpu.config import ColumnConfig


def presplit_data(
    item_feature_data: pd.DataFrame,
    user_item_interaction_data: pd.DataFrame,
    num_min: int = 3,
    remove_unk: bool = True,
    sort: bool = True,
    test_size_days: int = 14,
    item_id_col: str = None,
    ctm_id_col: str = None,
    columns: ColumnConfig = None,
) -> Tuple[pd.DataFrame, pd.DataFrame]:
    columns = columns or ColumnConfig()
    item_id_col = item_id_col or columns.specific_item_id
    ctm_id_col = ctm_id_col or columns.ctm_id
    np.random.seed(11)
    df = user_item_interaction_data

    if num_min > 0:
        counts = df[ctm_id_col].map(df[ctm_id_col].value_counts())
        df = df[counts >= num_min]

    if remove_unk:
        known_items = item_feature_data[item_id_col].unique()
        df = df[df[item_id_col].isin(known_items)]

    if sort:
        df = df.sort_values(by=[columns.hit_timestamp], axis=0)
        most_recent = datetime.strptime(max(df[columns.hit_date]), "%Y-%m-%d")
        limit_date = datetime.strftime(
            most_recent - timedelta(days=int(test_size_days)), "%Y-%m-%d"
        )
        train_set = df[df[columns.hit_date] <= limit_date]
        test_set = df[df[columns.hit_date] > limit_date]
    else:
        most_recent = datetime.strptime(max(df[columns.hit_date]), "%Y-%m-%d")
        oldest = datetime.strptime(min(df[columns.hit_date]), "%Y-%m-%d")
        total_days = max((most_recent - oldest).days, 1)
        test_size = min(test_size_days / total_days, 1.0)
        test_set = df.sample(frac=test_size, random_state=200)
        train_set = df.drop(test_set.index)

    train_users = train_set[ctm_id_col].unique()
    test_set = test_set[test_set[ctm_id_col].isin(train_users)]
    return train_set, test_set
