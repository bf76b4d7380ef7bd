"""Full-training CLI (reference ``main_train.py:409-428``).

Loads the best hyperparameters from a search (or JSON), presplits the full
interaction file with a 1-day test window (main_train.py:89-96), overrides
subtrain/valid sizes to 0.01 (main_train.py:81-82), trains, reports test
metrics on purchase-only and all-interaction ground truths
(main_train.py:271-294), and saves every artifact inference needs.

Usage:
    python -m gnn_recsys_tpu.cli.main_train --interactions-path ... \
        --item-feat-path ... --user-feat-path ... --out-dir models/run1
"""

from __future__ import annotations

import json

import click

from gnn_recsys_tpu.config import FixedParams, HyperParams, SPECIFIC
from gnn_recsys_tpu.data.io import read_data, save_txt
from gnn_recsys_tpu.data.presplit import presplit_data
from gnn_recsys_tpu.trial import run_trial
from gnn_recsys_tpu.utils.logging import get_logger


@click.command()
@click.option("--interactions-path", required=True,
              help="Full (unsplit) user-item interaction file.")
@click.option("--item-feat-path", required=True)
@click.option("--user-feat-path", required=True)
@click.option("--item-sport-path", default="")
@click.option("--user-sport-path", default="")
@click.option("--sport-sportg-path", default="")
@click.option("--sport-feat-path", default="")
@click.option("--sport-onehot-path", default="")
@click.option("--hyper-json", default=None,
              help="JSON file of hyperparameters (from hpsearch).")
@click.option("--out-dir", default="models/full_train")
@click.option("--num-epochs", default=100)
@click.option("--patience", default=3)
@click.option("--edge-batch-size", default=2048)
@click.option("--item-id-type", default=SPECIFIC)
@click.option("--duplicates", default="keep_all")
@click.option("--test-days", default=1, help="main_train.py:89-96 uses 1 day.")
@click.option("--check-embedding", is_flag=True, default=False,
              help="Print qualitative rec/coverage analysis after training.")
@click.option("--result-filepath", default="outputs/result_log.txt")
def main(interactions_path, item_feat_path, user_feat_path, item_sport_path,
         user_sport_path, sport_sportg_path, sport_feat_path,
         sport_onehot_path, hyper_json, out_dir, num_epochs, patience,
         edge_batch_size, item_id_type, duplicates, test_days,
         check_embedding, result_filepath):
    hyper = HyperParams()
    if hyper_json:
        with open(hyper_json) as f:
            hyper = HyperParams(**json.load(f))

    interactions = read_data(interactions_path)
    item_feat = read_data(item_feat_path)
    train_df, test_df = presplit_data(
        item_feat, interactions, num_min=3, remove_unk=True, sort=True,
        test_size_days=test_days,
    )

    fixed = FixedParams(
        remove=0.0,
        num_epochs=num_epochs,
        patience=patience,
        edge_batch_size=edge_batch_size,
        item_id_type=item_id_type,
        duplicates=duplicates,
        include_sport=bool(item_sport_path),
        # Full training uses tiny eval splits (main_train.py:81-82).
        valid_size=0.01,
        subtrain_size=0.01,
    )
    dataframes = dict(
        train=train_df,
        test=test_df,
        item_feat=item_feat,
        user_feat=read_data(user_feat_path),
    )
    if item_sport_path:
        dataframes.update(
            item_sport=read_data(item_sport_path),
            user_sport=read_data(user_sport_path),
            sport_sportg=read_data(sport_sportg_path),
            sport_feat=read_data(sport_feat_path),
            sport_onehot=read_data(sport_onehot_path),
        )

    result = run_trial(
        fixed, hyper, dataframes=dataframes, save_dir=out_dir,
        save_threshold=-1.0,  # always save after full training
        plots_dir="plots", verbose=True, check_embedding=check_embedding,
    )
    msg = (
        f"FULL TRAIN recall={result.recall:.4f} "
        f"precision={result.precision:.4f} coverage={result.coverage:.4f} "
        f"recall_purchase={result.recall_purchase:.4f} "
        f"time={result.train_time_s:.0f}s saved_to={result.saved_to}"
    )
    save_txt(msg, result_filepath)
    get_logger(__name__).info(msg)
    click.echo(msg)


if __name__ == "__main__":
    main()
