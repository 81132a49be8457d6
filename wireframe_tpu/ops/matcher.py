"""Public vertex-matching API.

The reference ships two dead matcher modules (models/HungarianMatcher.py —
a DETR box matcher, never imported; models/WireframeHungarianMatcher.py —
never imported) and re-implements the matching inline in its loss
(losses/WireframeLoss.py:106-246).  Here the matcher is ONE public,
on-device, batched component used by the loss and available standalone.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp

from wireframe_tpu.ops.lsa import solve_lsa_batch, solve_lsa_callback


@dataclass(frozen=True)
class WireframeMatcher:
    """Hungarian vertex matcher: L1 position cost + existence costs.

    cost(pred_i, real target j)   = |p_i - t_j|_1 + (1 - e_i)
    cost(pred_i, dummy column)    = e_i
    (semantics of WireframeLoss.py:200-232, solved exactly, on device)
    """

    backend: str = "device"  # "device" | "scipy"

    def __call__(self, pred_vertices: jnp.ndarray,
                 pred_existence: jnp.ndarray,
                 target_vertices: jnp.ndarray,
                 vertex_counts: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """
        Args:
          pred_vertices: (B, V, 3); pred_existence: (B, V) probabilities.
          target_vertices: (B, V, 3) zero-padded; vertex_counts: (B,).
        Returns:
          col4row: (B, V) int32 — target column assigned to each pred slot
            (columns >= count are dummies).
          matched: (B, V) bool — pred slot is matched to a REAL target.
        """
        # Imported here: losses depends on ops (lsa), not vice versa.
        from wireframe_tpu.losses.wireframe_loss import matching_cost_matrix

        cost = matching_cost_matrix(
            pred_vertices, pred_existence, target_vertices, vertex_counts)
        if self.backend == "scipy":
            col4row = solve_lsa_callback(cost)
        else:
            col4row = solve_lsa_batch(cost)
        matched = col4row < vertex_counts.astype(jnp.int32)[:, None]
        return col4row, matched
