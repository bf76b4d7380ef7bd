"""Checkpointing: train state, model config, graph, and id maps.

Capability parity with the reference's artifact set
(``/root/reference/main_train.py:384-406`` saves a torch ``state_dict``,
pickled hyper/fixed params, the DGL graph binary, and ctm/pdt id-map
pickles; ``main_inference.py:65-119`` reloads them): here the train state
goes through orbax, configs go to JSON, the graph to npz
(:mod:`gnn_recsys_tpu.graph.serialize`), and the pandas id maps to pickle.
"""

from __future__ import annotations

import dataclasses
import json
import os
import pickle
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp

from gnn_recsys_tpu.graph.hetero import HeteroGraph
from gnn_recsys_tpu.graph.serialize import load_graph, save_graph


def save_params(params, path: str) -> None:
    """Save a parameter pytree with orbax (async-safe, multi-host aware)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params)
    ckptr.wait_until_finished()


def load_params(path: str, like: Optional[Any] = None):
    """Load a parameter pytree saved by :func:`save_params`."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(path, target=like)
    return ckptr.restore(path)


def save_train_state(state, path: str) -> None:
    """Save a full flax ``TrainState`` (params + optimizer state + step).

    Enables EXACT mid-training resume via
    ``train_minibatch(..., state=restored, start_epoch=E)`` — a real
    version of the reference's vestigial ``start_epoch``
    (``main.py:537``/``run.py:83``, which never reloads weights).
    Only array leaves are stored; ``apply_fn``/``tx`` are reattached by
    :func:`load_train_state`.
    """
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        path,
        {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
        },
    )
    ckptr.wait_until_finished()


def load_train_state(path: str, like):
    """Restore a ``TrainState`` saved by :func:`save_train_state`.

    ``like`` is a freshly-constructed TrainState with the same model and
    optimizer (supplies apply_fn/tx and the pytree structure).
    """
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(
        path,
        target={
            "params": like.params,
            "opt_state": like.opt_state,
            "step": like.step,
        },
    )
    return like.replace(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )


def save_run(
    out_dir: str,
    params,
    model_kwargs: Dict[str, Any],
    fixed_params=None,
    hyper_params=None,
    graph: Optional[HeteroGraph] = None,
    id_maps: Optional[Dict[str, Any]] = None,
    extras: Optional[Dict[str, Any]] = None,
) -> None:
    """Persist everything inference needs (reference main_train.py:384-406)."""
    os.makedirs(out_dir, exist_ok=True)
    save_params(params, os.path.join(out_dir, "params"))
    with open(os.path.join(out_dir, "model.json"), "w") as f:
        json.dump(model_kwargs, f, indent=2, default=str)
    if fixed_params is not None:
        with open(os.path.join(out_dir, "fixed_params.json"), "w") as f:
            json.dump(dataclasses.asdict(fixed_params), f, indent=2)
    if hyper_params is not None:
        with open(os.path.join(out_dir, "hyper_params.json"), "w") as f:
            json.dump(dataclasses.asdict(hyper_params), f, indent=2)
    if graph is not None:
        save_graph(graph, os.path.join(out_dir, "graph.npz"))
    if id_maps is not None:
        with open(os.path.join(out_dir, "id_maps.pkl"), "wb") as f:
            pickle.dump(id_maps, f)
    if extras:
        with open(os.path.join(out_dir, "extras.pkl"), "wb") as f:
            pickle.dump(extras, f)


def load_run(out_dir: str):
    """Load a run directory saved by :func:`save_run`.

    Returns dict with keys: params, model_kwargs, fixed_params,
    hyper_params, graph, id_maps, extras (absent entries are None).
    """
    out: Dict[str, Any] = {}
    out["params"] = load_params(os.path.join(out_dir, "params"))
    with open(os.path.join(out_dir, "model.json")) as f:
        out["model_kwargs"] = json.load(f)
    for name in ("fixed_params", "hyper_params"):
        p = os.path.join(out_dir, f"{name}.json")
        out[name] = None
        if os.path.exists(p):
            with open(p) as f:
                out[name] = json.load(f)
    gpath = os.path.join(out_dir, "graph.npz")
    out["graph"] = load_graph(gpath) if os.path.exists(gpath) else None
    for name in ("id_maps", "extras"):
        p = os.path.join(out_dir, f"{name}.pkl")
        out[name] = None
        if os.path.exists(p):
            with open(p, "rb") as f:
                out[name] = pickle.load(f)
    return out


def model_kwargs_to_config(model_kwargs: Dict[str, Any]) -> Dict[str, Any]:
    """JSON round-trip fixups: tuples come back as lists."""
    kw = dict(model_kwargs)
    if "canonical_etypes" in kw:
        kw["canonical_etypes"] = tuple(tuple(e) for e in kw["canonical_etypes"])
    if "dims" in kw:
        kw["dims"] = tuple((str(k), int(v)) for k, v in kw["dims"])
    return kw
