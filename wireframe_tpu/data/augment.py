"""Batched on-device augmentation.

TPU-first replacement for the reference's host numpy augment
(datasets/building3d.py:131-146): X-flip (p=0.5), Y-flip (p=0.5), and a
z-rotation uniform in ±5°, applied consistently to the point cloud AND the
target vertices.  Runs inside the jitted train step on the whole batch —
no host round trip, different RNG per sample per step.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def augment_batch(rng: jax.Array, point_clouds: jnp.ndarray,
                  target_vertices: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """
    Args:
      rng: PRNG key.
      point_clouds: (B, N, D) — first 3 channels are XYZ.
      target_vertices: (B, V, 3) zero-padded GT vertices.
    Returns augmented (point_clouds, target_vertices).

    Padded vertex rows stay zero: flips/rotation are linear maps fixing the
    origin, so zero rows map to zero rows.
    """
    b = point_clouds.shape[0]
    k_fx, k_fy, k_rot = jax.random.split(rng, 3)

    flip_x = jax.random.bernoulli(k_fx, 0.5, (b,))
    flip_y = jax.random.bernoulli(k_fy, 0.5, (b,))
    angle = jax.random.uniform(
        k_rot, (b,), minval=-jnp.pi / 36, maxval=jnp.pi / 36)

    sx = jnp.where(flip_x, -1.0, 1.0)
    sy = jnp.where(flip_y, -1.0, 1.0)
    c, s = jnp.cos(angle), jnp.sin(angle)

    # Composite per-sample 3x3 linear map: rotz(angle) @ diag(sx, sy, 1).
    zeros = jnp.zeros_like(c)
    ones = jnp.ones_like(c)
    rot = jnp.stack([
        jnp.stack([c * sx, -s * sy, zeros], axis=-1),
        jnp.stack([s * sx, c * sy, zeros], axis=-1),
        jnp.stack([zeros, zeros, ones], axis=-1),
    ], axis=-2)  # (B, 3, 3)

    xyz = jnp.einsum("bnc,bdc->bnd", point_clouds[..., :3], rot)
    point_clouds = jnp.concatenate([xyz, point_clouds[..., 3:]], axis=-1)
    target_vertices = jnp.einsum("bvc,bdc->bvd", target_vertices, rot)
    return point_clouds, target_vertices
