"""On-demand inference CLI (reference ``main_inference.py:179-222``).

Usage:
    python -m gnn_recsys_tpu.cli.main_inference --run-dir models/run1 \
        --user-ids u123 --user-ids u456 [--k 10]
    python -m gnn_recsys_tpu.cli.main_inference --run-dir models/run1 --all
"""

from __future__ import annotations

import click

from gnn_recsys_tpu.inference import inference_ondemand


@click.command()
@click.option("--run-dir", required=True,
              help="Directory written by main_train / hp search save.")
@click.option("--user-ids", multiple=True,
              help="External user ids (repeatable).")
@click.option("--all", "all_users", is_flag=True, default=False,
              help="Recommend for every known user.")
@click.option("--k", default=10)
@click.option("--keep-already-bought", is_flag=True, default=False)
@click.option("--use-popularity/--no-use-popularity", default=None,
              help="Popularity boost at serving. Default: auto — boost "
                   "iff the saved run trained the hinge objective with "
                   "popularity_importance on (the boost is negative for "
                   "softmax-trained latents).")
@click.option("--weight-popularity", default=1.0)
@click.option("--mesh", "mesh_devices", default=0,
              help="Distribute serving over N devices (embedding "
                   "inference data-parallel + catalog-sharded retrieval; "
                   "0 = single device). Results are identical.")
def main(run_dir, user_ids, all_users, k, keep_already_bought,
         use_popularity, weight_popularity, mesh_devices):
    ids = "all" if all_users else list(user_ids)
    if not ids:
        raise click.UsageError("pass --user-ids ... or --all")
    mesh = None
    if mesh_devices:
        from gnn_recsys_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(mesh_devices)
    recs = inference_ondemand(
        run_dir,
        ids,
        k=k,
        remove_already_bought=not keep_already_bought,
        use_popularity=use_popularity,
        weight_popularity=weight_popularity,
        mesh=mesh,
    )
    for uid, items in recs.items():
        click.echo(f"{uid}: {items}")


if __name__ == "__main__":
    main()
