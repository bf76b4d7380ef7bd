"""Per-etype message-passing layers (flax.linen).

TPU-native re-design of the reference's ``ConvLayer`` / ``NodeEmbedding``
(``/root/reference/src/model.py:10-237``): a SAGEConv-style update

    z = ReLU(W_self . h_self + W_neigh . AGG(neighbors))

with seven aggregator modes (``mean``, ``mean_nn``, ``pool_nn``, ``lstm`` and
their ``*_edge`` occurrence-weighted variants) and optional L2 row
normalization with a zero-guard.

Design difference vs. the reference: aggregation itself is NOT inside the
layer.  The layer exposes ``transform_src`` (dropout + optional pre-MLP,
applied once per *source node*, not per message — cheaper than DGL's
per-message transform) and ``combine`` (self/neighbor towers + ReLU + norm);
a hetero-conv orchestrator owns the gather/segment reduction so the same
layer serves full-graph, sampled-tree, and Pallas execution paths.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

AGGREGATOR_TYPES = (
    "mean",
    "mean_nn",
    "pool_nn",
    "lstm",
    "mean_edge",
    "mean_nn_edge",
    "pool_nn_edge",
    "lstm_edge",
)


def xavier_uniform_gain(gain: float):
    """Xavier/Glorot uniform init scaled by ``gain`` (torch semantics).

    The reference initializes every layer with
    ``nn.init.xavier_uniform_(w, gain=calculate_gain('relu'))``
    (``src/model.py:45-53``); flax's ``glorot_uniform`` has gain 1, so we
    scale the limit by ``gain`` explicitly.
    """

    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[0], shape[1]
        limit = gain * np.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -limit, limit)

    return init


RELU_GAIN = float(np.sqrt(2.0))
SIGMOID_GAIN = 1.0


class _MaskedLSTMStep(nn.Module):
    """One masked LSTM step: the carry freezes where the slot is padding."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, carry, xs):
        x, m = xs
        new_carry, y = nn.LSTMCell(self.features, dtype=self.dtype,
                                   name="cell")(carry, x)
        merged = jax.tree.map(
            lambda new, old: jnp.where(m[:, None], new, old), new_carry, carry
        )
        return merged, y


class MaskedLSTMReducer(nn.Module):
    """LSTM over the padded neighbor axis; returns the final hidden state.

    Equivalent to the reference's degree-bucketed mailbox LSTM
    (``src/model.py:107-121``): valid slots are contiguous from slot 0, so
    freezing the carry on masked slots reproduces running the LSTM over the
    true-length sequence.  Zero-initialized carry matches the reference.
    """

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, msgs: jax.Array, mask: jax.Array) -> jax.Array:
        n = msgs.shape[0]
        scan = nn.scan(
            _MaskedLSTMStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        carry = (
            jnp.zeros((n, self.features), msgs.dtype),
            jnp.zeros((n, self.features), msgs.dtype),
        )
        (final_c, final_h), _ = scan(self.features, dtype=self.dtype,
                                     name="scan")(
            carry, (msgs, mask)
        )
        del final_c
        return final_h


class NodeEmbedding(nn.Module):
    """Linear projection of raw node features into embedding space
    (reference ``src/model.py:10-24``)."""

    out_feats: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, node_feats: jax.Array) -> jax.Array:
        return nn.Dense(self.out_feats, dtype=self.dtype,
                        name="proj_feats")(node_feats)


class ConvLayer(nn.Module):
    """One message-passing layer for one canonical edge type.

    ``in_neigh_feats``/``in_self_feats`` mirror the reference's
    ``in_feats=(src_dim, dst_dim)`` tuple (``src/model.py:94``).
    """

    in_neigh_feats: int
    in_self_feats: int
    out_feats: int
    aggregator_type: str = "mean"
    dropout: float = 0.0
    norm: bool = True
    dtype: Optional[jnp.dtype] = None  # computation dtype (bf16 on the MXU)

    def setup(self):
        if self.aggregator_type not in AGGREGATOR_TYPES:
            raise KeyError(
                f"Aggregator type {self.aggregator_type} not recognized."
            )
        kinit = xavier_uniform_gain(RELU_GAIN)
        self.dropout_fn = nn.Dropout(self.dropout)
        self.fc_self = nn.Dense(
            self.out_feats, use_bias=False, kernel_init=kinit,
            dtype=self.dtype, name="fc_self"
        )
        self.fc_neigh = nn.Dense(
            self.out_feats, use_bias=False, kernel_init=kinit,
            dtype=self.dtype, name="fc_neigh"
        )
        if self.aggregator_type in ("mean_nn", "mean_nn_edge", "pool_nn", "pool_nn_edge"):
            self.fc_preagg = nn.Dense(
                self.in_neigh_feats,
                use_bias=False,
                kernel_init=kinit,
                dtype=self.dtype,
                name="fc_preagg",
            )
        if self.aggregator_type in ("lstm", "lstm_edge"):
            self.lstm_reducer = MaskedLSTMReducer(
                self.in_neigh_feats, dtype=self.dtype, name="lstm"
            )

    @property
    def reducer(self) -> str:
        """'mean', 'max' or 'lstm' — which reduction the orchestrator runs."""
        if self.aggregator_type.startswith("pool"):
            return "max"
        if self.aggregator_type.startswith("lstm"):
            return "lstm"
        return "mean"

    @property
    def edge_weighted(self) -> bool:
        return self.aggregator_type.endswith("_edge")

    def transform_src(self, h_neigh: jax.Array, deterministic: bool = True) -> jax.Array:
        """Dropout + optional ReLU(pre-MLP), applied on source-node states."""
        h = self.dropout_fn(h_neigh, deterministic=deterministic)
        if self.aggregator_type in ("mean_nn", "mean_nn_edge", "pool_nn", "pool_nn_edge"):
            h = nn.relu(self.fc_preagg(h))
        return h

    def lstm_reduce(self, msgs: jax.Array, mask: jax.Array) -> jax.Array:
        """Masked LSTM aggregation. msgs: [N, K, D]; mask: [N, K] -> [N, D]."""
        return self.lstm_reducer(msgs, mask)

    def combine(
        self,
        h_self: jax.Array,
        h_neigh_agg: jax.Array,
        deterministic: bool = True,
    ) -> jax.Array:
        """Self/neighbor towers, ReLU, optional zero-guarded L2 row norm
        (reference ``src/model.py:226-235``)."""
        h_self = self.dropout_fn(h_self, deterministic=deterministic)
        z = self.fc_self(h_self) + self.fc_neigh(h_neigh_agg)
        z = nn.relu(z)
        if self.norm:
            z_norm = jnp.linalg.norm(z, ord=2, axis=-1, keepdims=True)
            z_norm = jnp.where(z_norm == 0.0, 1.0, z_norm)
            z = z / z_norm
        return z


class PredictingLayer(nn.Module):
    """MLP scorer head: concat(user, item) -> 128 -> 32 -> 1 -> sigmoid
    (reference ``src/model.py:240-272``)."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        relu_init = xavier_uniform_gain(RELU_GAIN)
        sig_init = xavier_uniform_gain(SIGMOID_GAIN)
        x = nn.Dense(128, kernel_init=relu_init, dtype=self.dtype,
                     name="hidden_1")(x)
        x = nn.relu(x)
        x = nn.Dense(32, kernel_init=relu_init, dtype=self.dtype,
                     name="hidden_2")(x)
        x = nn.relu(x)
        x = nn.Dense(1, kernel_init=sig_init, dtype=self.dtype,
                     name="output")(x)
        return nn.sigmoid(x)


def l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """torch ``F.normalize(p=2, dim=-1)`` semantics (clamp, not zero-guard)."""
    norm = jnp.linalg.norm(x, ord=2, axis=-1, keepdims=True)
    return x / jnp.maximum(norm, eps)
