"""Edge-prediction <-> adjacency-matrix conversions (batched, on device).

Capability parity with models/utils.py:10-36 (adjacency construction and
edge-label building), re-expressed on the static global pair axis with no
Python loops.
"""

from __future__ import annotations

import jax.numpy as jnp

from wireframe_tpu.ops.pairs import triu_pairs


def adjacency_from_edge_probs(edge_probs: jnp.ndarray, v: int,
                              threshold: float = 0.5) -> jnp.ndarray:
    """(B, E) pair probabilities -> (B, V, V) symmetric 0/1 adjacency."""
    pairs = triu_pairs(v)
    b = edge_probs.shape[0]
    on = (edge_probs > threshold).astype(jnp.float32)
    adj = jnp.zeros((b, v, v), jnp.float32)
    adj = adj.at[:, pairs[:, 0], pairs[:, 1]].set(on)
    adj = adj.at[:, pairs[:, 1], pairs[:, 0]].set(on)
    return adj


def edge_probs_from_adjacency(adj: jnp.ndarray) -> jnp.ndarray:
    """(B, V, V) adjacency -> (B, E) values on the global pair axis."""
    v = adj.shape[-1]
    pairs = triu_pairs(v)
    return adj[:, pairs[:, 0], pairs[:, 1]]
