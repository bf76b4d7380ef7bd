"""Full-batch training loop (BASELINE config[0] gate).

The reference trains with DGL edge dataloaders over CPU worker processes
(``/root/reference/src/train/run.py:83-139``).  The TPU-native full-batch
mode instead treats ALL training edges as one batch: one jit-compiled step
does on-device negative sampling, false-negative masking, a full-graph
layer-wise forward, the max-margin loss, and the Adam update — zero host
round-trips inside the epoch loop.

Semantics kept from the reference loop:
  * uniform negative destination corruption per positive edge
    (``src/sampling.py:163-165``),
  * false negatives masked against the full (train+valid) edge set
    (``src/train/run.py:92-103``),
  * optional recency weighting of the loss (``src/model.py:526-531``).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from gnn_recsys_tpu.graph.hetero import CanonicalEtype, HeteroGraph
from gnn_recsys_tpu.models.conv_model import ConvModel
from gnn_recsys_tpu.models.loss import max_margin_loss
from gnn_recsys_tpu.ops.membership import build_padded_pair_set, pair_set_contains
from gnn_recsys_tpu.ops.negative import uniform_negative_dst
from gnn_recsys_tpu.retrieval.metrics import get_metrics_at_k
from gnn_recsys_tpu.retrieval.recs import model_score_fn


@dataclasses.dataclass
class FullBatchConfig:
    delta: float = 0.266
    neg_sample_size: int = 63
    lr: float = 1e-3
    num_epochs: int = 100
    remove_false_negative: bool = True
    use_recency: bool = False
    k: int = 10
    eval_every: int = 10
    patience: int = 5
    seed: int = 11


class TrainState(train_state.TrainState):
    pass


def init_model(
    model: ConvModel,
    graph: HeteroGraph,
    features: Dict[str, jax.Array],
    seed: int = 0,
) -> Dict:
    """Initialize parameters for EVERY (layer, etype) pair.

    Traces the full ``__call__`` (embed -> all conv layers over all etypes
    -> predictor) on a minimal schema-complete dummy graph — one node per
    ntype, one edge per etype — so params exist for every destination type
    at every layer.  A trained model must be able to embed ALL node types
    (reference ``src/train/run.py:311-349`` iterates every ntype), so
    seeding only user/item trees (the previous strategy) left the top
    layer's sport-destination ConvLayers uncreated and full-graph inference
    crashed on ``include_sport=True`` graphs.  Param shapes are
    graph-size independent, so this stays O(#etypes), not O(|E|).
    """
    from gnn_recsys_tpu.graph.hetero import build_hetero_graph

    etypes = tuple(model.canonical_etypes)
    ntypes = model.ntypes
    zero = np.zeros(1, np.int32)
    tiny = build_hetero_graph(
        schema={et: (zero, zero) for et in etypes},
        num_nodes_dict={nt: 1 for nt in ntypes},
    )
    feats = {
        nt: jnp.zeros((1, features[nt].shape[-1]), features[nt].dtype)
        for nt in ntypes
        if nt in features
    }
    pairs = {
        et: (jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32))
        for et in etypes
        if et[0] == "user" and et[2] == "item"
    }
    return model.init(
        jax.random.PRNGKey(seed), tiny, feats, pairs, pairs,
        deterministic=True,
    )


def make_full_batch_step(
    model: ConvModel,
    cfg: FullBatchConfig,
    train_etypes: Tuple[CanonicalEtype, ...],
) -> Callable:
    """Build the jit'd (state, graph, features, pos, keys, recency, rng) -> (state, loss)."""

    def step(state, graph, features, pos_pairs, edge_tables, recency, rng):
        num_items = graph.num_nodes("item")

        neg_pairs = {}
        neg_mask = {}
        rngs = jax.random.split(rng, len(train_etypes) + 1)
        for i, et in enumerate(train_etypes):
            pos_u, _ = pos_pairs[et]
            ns, nd = uniform_negative_dst(
                rngs[i], pos_u, num_items, cfg.neg_sample_size
            )
            neg_pairs[et] = (ns, nd)
            if cfg.remove_false_negative:
                neg_mask[et] = pair_set_contains(
                    edge_tables[et], pos_u, nd
                ).astype(jnp.float32)

        def loss_fn(params):
            _, pos_s, neg_s = model.apply(
                params,
                graph,
                features,
                pos_pairs,
                neg_pairs,
                deterministic=False,
                rngs={"dropout": rngs[-1]},
            )
            return max_margin_loss(
                pos_s,
                neg_s,
                delta=cfg.delta,
                negative_mask=neg_mask if cfg.remove_false_negative else None,
                recency_scores=recency if cfg.use_recency else None,
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads=grads)
        return state, loss

    return jax.jit(step, donate_argnums=(0,))


def compute_embeddings(
    model: ConvModel,
    params,
    graph: HeteroGraph,
    features: Dict[str, jax.Array],
) -> Dict[str, jax.Array]:
    """Full-graph embedding inference (reference ``get_embeddings``,
    src/train/run.py:311-349, without the minibatch scatter — one layer-wise
    pass covers every node)."""

    @jax.jit
    def run(params, graph, features):
        def fwd(mdl):
            h = mdl.embed_features(features)
            return mdl.get_repr(graph, h, deterministic=True)

        return model.apply(params, method=fwd)

    return run(params, graph, features)


def train_full_batch(
    model: ConvModel,
    data_graph: HeteroGraph,
    full_graph: HeteroGraph,
    features: Dict[str, jax.Array],
    train_pairs: Dict[CanonicalEtype, Tuple[np.ndarray, np.ndarray]],
    test_ground_truth: Tuple[np.ndarray, np.ndarray],
    cfg: FullBatchConfig,
    already_bought: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    verbose: bool = False,
):
    """Train on all edges per step; returns (state, history dict).

    ``data_graph`` is the message-passing graph (train edges only);
    ``full_graph`` supplies the edge set for false-negative masking
    (the reference masks against the train+valid graph, run.py:100).
    """
    params = init_model(model, data_graph, features, seed=cfg.seed)
    tx = optax.adam(cfg.lr)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    train_etypes = tuple(train_pairs.keys())
    step_fn = make_full_batch_step(model, cfg, train_etypes)

    pos_pairs = {
        et: (jnp.asarray(u, jnp.int32), jnp.asarray(i, jnp.int32))
        for et, (u, i) in train_pairs.items()
    }
    # False negatives are masked against the FULL (train+valid) edge set,
    # matching the reference's valid_graph query (run.py:100).
    num_users = full_graph.num_nodes("user")
    edge_tables = {
        et: build_padded_pair_set(
            np.asarray(full_graph.rels[et].src),
            np.asarray(full_graph.rels[et].dst),
            num_src=num_users,
        )
        for et in train_etypes
    }
    recency = {
        et: data_graph.rels[et].edata["recency"]
        for et in train_etypes
        if "recency" in data_graph.rels[et].edata
    }

    rng = jax.random.PRNGKey(cfg.seed)
    history = {"loss": [], "recall": [], "precision": [], "coverage": [],
               "epoch_time": []}
    best_recall, best_epoch = -1.0, -1
    for epoch in range(cfg.num_epochs):
        t0 = time.perf_counter()
        rng, sub = jax.random.split(rng)
        state, loss = step_fn(
            state, data_graph, features, pos_pairs, edge_tables, recency, sub
        )
        loss = float(loss)
        history["loss"].append(loss)
        history["epoch_time"].append(time.perf_counter() - t0)
        # eval_every=0 disables the cadence (same contract as
        # MinibatchConfig.metrics_every); the final epoch always evals.
        if (
            cfg.eval_every and epoch % cfg.eval_every == cfg.eval_every - 1
        ) or epoch == cfg.num_epochs - 1:
            h = compute_embeddings(model, state.params, data_graph, features)
            precision, recall, coverage = get_metrics_at_k(
                h["user"],
                h["item"],
                test_ground_truth,
                already_bought,
                cfg.k,
                score_fn=model_score_fn(model.pred, state.params),
            )
            history["recall"].append(recall)
            history["precision"].append(precision)
            history["coverage"].append(coverage)
            if verbose:
                print(
                    f"epoch {epoch}: loss={loss:.4f} recall@{cfg.k}={recall:.4f} "
                    f"precision={precision:.4f} coverage={coverage:.4f}"
                )
            if recall > best_recall:
                best_recall, best_epoch = recall, epoch
            elif epoch - best_epoch >= cfg.patience * cfg.eval_every:
                break
    return state, history
