"""Max-margin ranking loss.

TPU-native equivalent of the reference ``max_margin_loss``
(``/root/reference/src/model.py:473-533``): per etype

    scores = ReLU(neg + delta - pos - false_negative_mask)
    optionally scores /= recency  (per positive edge)

then the mean over ALL score elements of ALL etypes (the reference
concatenates the per-etype [rows, S] matrices and takes one mean).

Extension for static-shape minibatching: an optional per-positive validity
mask (``pair_mask``) excludes padded batch rows from the mean — the
reference never pads, so all-valid masks reproduce it exactly.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from gnn_recsys_tpu.graph.hetero import CanonicalEtype


def max_margin_loss(
    pos_score: Dict[CanonicalEtype, jax.Array],
    neg_score: Dict[CanonicalEtype, jax.Array],
    delta: float,
    negative_mask: Optional[Dict[CanonicalEtype, jax.Array]] = None,
    recency_scores: Optional[Dict[CanonicalEtype, jax.Array]] = None,
    pair_mask: Optional[Dict[CanonicalEtype, jax.Array]] = None,
) -> jax.Array:
    """Compute the max-margin loss.

    pos_score[etype]: [B]; neg_score[etype]: [B, S].
    negative_mask[etype]: [B, S] float (1.0 softly cancels false negatives,
    matching the reference's subtract-the-mask trick, src/model.py:519-521).
    recency_scores[etype]: [B] divisor per positive edge (src/model.py:526-531).
    pair_mask[etype]: [B] bool, False rows contribute nothing.
    """
    total = jnp.asarray(0.0, dtype=jnp.float32)
    count = jnp.asarray(0.0, dtype=jnp.float32)
    for etype, neg in neg_score.items():
        pos = pos_score[etype]
        b, s = neg.shape
        scores = neg + delta - pos[:, None]
        if negative_mask is not None and etype in negative_mask:
            scores = scores - negative_mask[etype]
        scores = jax.nn.relu(scores)
        if recency_scores is not None and etype in recency_scores:
            scores = scores / recency_scores[etype][:, None]
        if pair_mask is not None and etype in pair_mask:
            valid = pair_mask[etype].astype(scores.dtype)[:, None]
            scores = scores * valid
            count = count + jnp.sum(valid) * s
        else:
            count = count + float(b * s)
        total = total + jnp.sum(scores)
    return total / jnp.maximum(count, 1.0)
