"""Static vertex-pair (candidate-edge) machinery.

The reference enumerates vertex pairs with a per-call Python double loop
(models/EdgePredictor.py:82-89) over a *dynamic* prefix of vertex slots,
which forces per-sample host loops.  TPU-native replacement: ONE static
lexicographic upper-triangular pair table over all `V = max_vertices`
slots, plus masks.

Key property exploited for loss/eval parity: the reference's pairs over a
prefix of `c` vertices, in its loop order, are exactly the subsequence of
the global V-slot lexicographic pairs whose endpoints are both `< c`,
*in the same order*.  So positional comparisons in the reference
(losses/WireframeLoss.py:80-86) map 1:1 onto masked comparisons on the
static global pair axis.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def num_pairs(v: int) -> int:
    return v * (v - 1) // 2


@functools.lru_cache(maxsize=None)
def triu_pairs_np(v: int) -> np.ndarray:
    """(E, 2) int32 pairs (i, j), i<j, lexicographic. E = v*(v-1)/2."""
    i, j = np.triu_indices(v, k=1)
    return np.stack([i, j], axis=1).astype(np.int32)


def triu_pairs(v: int) -> jnp.ndarray:
    return jnp.asarray(triu_pairs_np(v))


def pair_slot(i, j, v: int):
    """Global pair-slot index of pair (i, j) with i<j over v slots.

    slot(i, j) = i*v - i*(i+1)/2 + (j - i - 1).  Works on arrays.
    """
    i = jnp.asarray(i, jnp.int32)
    j = jnp.asarray(j, jnp.int32)
    return i * v - (i * (i + 1)) // 2 + (j - i - 1)


def pair_validity_mask(counts, v: int) -> jnp.ndarray:
    """(B, E) bool — pairs whose BOTH endpoints are < counts[b].

    This is the mask equivalent of the reference's prefix slicing
    (models/PointCloudToWireframe.py:77-97): a pair is "real" iff it would
    appear in the reference's C(count, 2) enumeration.
    """
    pairs = triu_pairs(v)  # (E, 2)
    counts = jnp.asarray(counts, jnp.int32)
    # j > i always, so j < count implies i < count.
    return pairs[None, :, 1] < counts[:, None]


def edge_labels_from_edges(edges: np.ndarray, v: int) -> np.ndarray:
    """(E,) float32 binary labels on the global pair axis from GT edges.

    `edges` is (n, 2) int with 0-based vertex ids (any order per row).
    Host-side (runs in the data pipeline); matches the semantics of
    models/utils.py:24-36 + train.py:61-88 re-expressed on global slots.
    """
    labels = np.zeros(num_pairs(v), dtype=np.float32)
    if len(edges) == 0:
        return labels
    e = np.asarray(edges, dtype=np.int64)
    lo = np.minimum(e[:, 0], e[:, 1])
    hi = np.maximum(e[:, 0], e[:, 1])
    keep = (lo >= 0) & (hi < v) & (lo != hi)
    lo, hi = lo[keep], hi[keep]
    slots = lo * v - (lo * (lo + 1)) // 2 + (hi - lo - 1)
    labels[slots] = 1.0
    return labels


def pairs_from_mask(probs: np.ndarray, counts: int, v: int,
                    thresh: float = 0.5) -> np.ndarray:
    """Host-side: decode (E,) pair probs into an (n, 2) edge-index array,
    keeping pairs with prob > thresh and both endpoints < counts.

    Mirrors evaluate.py:80-82 on the static pair axis.
    """
    pairs = triu_pairs_np(v)
    keep = (probs > thresh) & (pairs[:, 1] < counts)
    return pairs[keep].astype(np.int64)


def pairs_from_slot_mask(probs: np.ndarray, live: np.ndarray, v: int,
                         thresh: float = 0.5) -> np.ndarray:
    """Host-side decode for the "existence" slot-mask mode: keep pairs
    with prob > thresh whose BOTH endpoints are live per-slot (live slots
    are scattered, not a prefix)."""
    pairs = triu_pairs_np(v)
    live = np.asarray(live, bool)
    keep = (probs > thresh) & live[pairs[:, 0]] & live[pairs[:, 1]]
    return pairs[keep].astype(np.int64)
