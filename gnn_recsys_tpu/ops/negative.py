"""On-device negative edge sampling.

TPU-native replacement for DGL's ``dgl.dataloading.negative_sampler.Uniform``
(``/root/reference/src/sampling.py:163-165``): for each positive edge
(u, i) draw ``neg_sample_size`` uniform destination nodes, keeping the same
source — the corruption scheme the reference trains with.  Runs inside the
jit'd step with ``jax.random`` instead of host-side numpy in dataloader
workers.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def uniform_negative_dst(
    key: jax.Array,
    pos_src: jax.Array,
    num_dst: int,
    neg_sample_size: int,
) -> Tuple[jax.Array, jax.Array]:
    """Uniformly corrupt destinations.

    pos_src: [B] source node ids. Returns (neg_src [B, S], neg_dst [B, S]).
    """
    b = pos_src.shape[0]
    neg_dst = jax.random.randint(
        key, (b, neg_sample_size), 0, num_dst, dtype=jnp.int32
    )
    neg_src = jnp.broadcast_to(pos_src[:, None], (b, neg_sample_size))
    return neg_src, neg_dst
