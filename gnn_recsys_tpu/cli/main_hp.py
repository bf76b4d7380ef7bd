"""Hyperparametrization CLI (reference ``main.py:529-607``).

Runs the search driver over full build/train/eval trials; each trial logs
its result and checkpoints the search state for crash recovery.

Usage:
    python -m gnn_recsys_tpu.cli.main_hp --train-path ... --test-path ... \
        --item-feat-path ... --user-feat-path ... [options]
"""

from __future__ import annotations

import click

from gnn_recsys_tpu.config import DataPaths, FixedParams, HyperParams, SPECIFIC
from gnn_recsys_tpu.data.io import save_txt
from gnn_recsys_tpu.hpsearch import run_search
from gnn_recsys_tpu.utils.logging import get_logger
from gnn_recsys_tpu.trial import run_trial


@click.command()
@click.option("--from-beginning", is_flag=True, default=False,
              help="Restart the search instead of resuming from checkpoint.")
@click.option("--visualization", is_flag=True, default=False,
              help="Save loss/metric plots per trial.")
@click.option("--remove", default=0.99, help="Proportion of users removed.")
@click.option("--num-epochs", default=100)
@click.option("--start-epoch", default=0)
@click.option("--patience", default=3)
@click.option("--edge-batch-size", default=2048)
@click.option("--item-id-type", default=SPECIFIC)
@click.option("--duplicates", default="keep_all")
@click.option("--n-calls", default=200, help="Search budget (trials).")
@click.option("--logdir", default=".")
@click.option("--train-path", required=True)
@click.option("--test-path", required=True)
@click.option("--item-feat-path", required=True)
@click.option("--user-feat-path", required=True)
@click.option("--item-sport-path", default="")
@click.option("--user-sport-path", default="")
@click.option("--sport-sportg-path", default="")
@click.option("--sport-feat-path", default="")
@click.option("--sport-onehot-path", default="")
@click.option("--result-filepath", default="outputs/result_log.txt")
def main(from_beginning, visualization, remove, num_epochs, start_epoch,
         patience, edge_batch_size, item_id_type, duplicates, n_calls,
         logdir, result_filepath, **path_kwargs):
    paths = DataPaths(result_filepath=result_filepath, **path_kwargs)
    fixed = FixedParams(
        remove=remove,
        num_epochs=num_epochs,
        start_epoch=start_epoch,
        patience=patience,
        edge_batch_size=edge_batch_size,
        item_id_type=item_id_type,
        duplicates=duplicates,
        include_sport=bool(path_kwargs.get("item_sport_path")),
    )

    from gnn_recsys_tpu.trial import SAVE_THRESHOLDS

    best_recall = SAVE_THRESHOLDS.get(item_id_type, 0.08)

    def fitness(hyper: HyperParams) -> float:
        nonlocal best_recall
        # models/best holds exactly the best-so-far run: gate each trial's
        # save on beating both the reference's acceptance threshold
        # (main.py:404-405) and every previous trial, so successive
        # passing-but-worse trials can't clobber it.
        result = run_trial(
            fixed,
            hyper,
            paths=paths,
            save_dir=f"{logdir}/models/best",
            save_threshold=best_recall,
            plots_dir=f"{logdir}/plots" if visualization else None,
            verbose=True,
        )
        best_recall = max(best_recall, result.recall)
        line = (
            f"hyper={hyper} recall={result.recall:.4f} "
            f"precision={result.precision:.4f} coverage={result.coverage:.4f} "
            f"recall_purchase={result.recall_purchase:.4f} "
            f"time={result.train_time_s:.0f}s"
        )
        if result.inference_recall is not None:
            line += f" inference_recall={result.inference_recall:.4f}"
        if result.inference_recall_all_users is not None:
            line += (" inference_recall_all_users="
                     f"{result.inference_recall_all_users:.4f}")
        save_txt(line, paths.result_filepath)
        return result.recall

    state = run_search(
        fitness, n_calls=n_calls, logdir=logdir,
        from_beginning=from_beginning, verbose=True,
    )
    best = state.best
    log = get_logger(__name__)
    log.info("best recall: %.4f", -best.objective)
    log.info("best hyper: %s", best.hyper)


if __name__ == "__main__":
    main()
