"""Graph serialization: HeteroGraph <-> npz on disk.

TPU-native replacement for DGL's ``save_graphs``/``load_graphs`` binary
format (used by the reference to persist the trained graph for inference,
``/root/reference/main_train.py:398`` / ``src/utils_inference.py:6-12``):
the graph is already a pytree of arrays, so the checkpoint format is one
compressed ``.npz`` of arrays plus an embedded JSON header describing the
schema (etypes, node counts, feature names).
"""

from __future__ import annotations

import json
from typing import Dict

import jax.numpy as jnp
import numpy as np

from gnn_recsys_tpu.graph.hetero import HeteroGraph, Relation


def _flat_key(*parts: str) -> str:
    return "\x1f".join(parts)


def save_graph(graph: HeteroGraph, path: str) -> None:
    """Write the graph to ``path`` (.npz)."""
    arrays: Dict[str, np.ndarray] = {}
    header = {"ntypes": dict(graph.num_nodes_tuple), "etypes": [], "ndata": {}}
    for et, rel in graph.rels.items():
        et_key = "/".join(et)
        header["etypes"].append(
            {"etype": list(et), "edata": sorted(rel.edata.keys())}
        )
        names = ["src", "dst", "nbr", "nbr_eid", "nbr_mask", "deg"]
        if rel.eid_pos is not None:
            names.append("eid_pos")
        for name in names:
            arrays[_flat_key("rel", et_key, name)] = np.asarray(
                getattr(rel, name)
            )
        for name, arr in rel.edata.items():
            arrays[_flat_key("edata", et_key, name)] = np.asarray(arr)
    for nt, feats in graph.ndata.items():
        header["ndata"][nt] = sorted(feats.keys())
        for name, arr in feats.items():
            arrays[_flat_key("ndata", nt, name)] = np.asarray(arr)
    arrays["__header__"] = np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8
    )
    with open(path, "wb") as f:
        np.savez_compressed(f, **arrays)


def load_graph(path: str) -> HeteroGraph:
    """Read a graph written by :func:`save_graph`."""
    with np.load(path) as z:
        header = json.loads(bytes(z["__header__"]).decode())
        rels = {}
        for entry in header["etypes"]:
            et = tuple(entry["etype"])
            et_key = "/".join(et)

            def arr(name):
                return jnp.asarray(z[_flat_key("rel", et_key, name)])

            edata = {
                name: jnp.asarray(z[_flat_key("edata", et_key, name)])
                for name in entry["edata"]
            }
            pos_key = _flat_key("rel", et_key, "eid_pos")
            if pos_key in z:
                eid_pos = jnp.asarray(z[pos_key])
            else:  # file written before eid_pos existed: recompute
                from gnn_recsys_tpu.graph.hetero import compute_eid_pos

                eid_pos = jnp.asarray(compute_eid_pos(
                    z[_flat_key("rel", et_key, "nbr_eid")],
                    z[_flat_key("rel", et_key, "nbr_mask")],
                    int(z[_flat_key("rel", et_key, "src")].shape[0]),
                ))
            # Normalize the -1 padding invariant (build_relation) so files
            # written by old writers (0-padded) sample correctly: the
            # sampler derives degrees as count(row != -1).
            nbr_mask = np.asarray(z[_flat_key("rel", et_key, "nbr_mask")])
            nbr = np.where(
                nbr_mask, np.asarray(z[_flat_key("rel", et_key, "nbr")]), -1
            ).astype(np.int32)
            rels[et] = Relation(
                src=arr("src"),
                dst=arr("dst"),
                nbr=jnp.asarray(nbr),
                nbr_eid=arr("nbr_eid"),
                nbr_mask=arr("nbr_mask"),
                deg=arr("deg"),
                edata=edata,
                eid_pos=eid_pos,
            )
        ndata = {
            nt: {
                name: jnp.asarray(z[_flat_key("ndata", nt, name)])
                for name in names
            }
            for nt, names in header["ndata"].items()
        }
        for nt in header["ntypes"]:
            ndata.setdefault(nt, {})
        return HeteroGraph(
            rels=rels,
            ndata=ndata,
            num_nodes_tuple=tuple(sorted(header["ntypes"].items())),
        )
