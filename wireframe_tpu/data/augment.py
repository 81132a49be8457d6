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
                  target_vertices: jnp.ndarray,
                  rot_degrees: float = 5.0,
                  jitter_std: float = 0.0,
                  scale_range: float = 0.0,
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """
    Args:
      rng: PRNG key.
      point_clouds: (B, N, D) — first 3 channels are XYZ.
      target_vertices: (B, V, 3) zero-padded GT vertices.
      rot_degrees: z-rotation range in ± degrees (reference: 5).
      jitter_std: Gaussian XYZ noise std applied to POINTS only (a
        sensor-noise model; targets stay exact).  Padded all-zero point
        rows are left untouched so the validity mask is preserved.
      scale_range: r>0 draws a per-sample uniform scale in [1-r, 1+r]
        applied to cloud AND vertices (label-consistent).
    Returns augmented (point_clouds, target_vertices).

    Padded vertex rows stay zero: flips/rotation/scale are linear maps
    fixing the origin, so zero rows map to zero rows.
    """
    b = point_clouds.shape[0]
    k_fx, k_fy, k_rot, k_jit, k_scale = jax.random.split(rng, 5)

    flip_x = jax.random.bernoulli(k_fx, 0.5, (b,))
    flip_y = jax.random.bernoulli(k_fy, 0.5, (b,))
    rot_rad = rot_degrees * jnp.pi / 180.0
    angle = jax.random.uniform(
        k_rot, (b,), minval=-rot_rad, maxval=rot_rad)

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
    if scale_range > 0.0:
        scale = jax.random.uniform(
            k_scale, (b, 1, 1),
            minval=1.0 - scale_range, maxval=1.0 + scale_range)
        rot = rot * scale

    xyz = jnp.einsum("bnc,bdc->bnd", point_clouds[..., :3], rot)
    if jitter_std > 0.0:
        # Padding convention: an all-zero RAW row is invalid
        # (PointNetEncoder.py:85); jittering it would make padding look
        # like real points, so noise applies to valid rows only.
        valid = jnp.any(point_clouds != 0.0, axis=-1, keepdims=True)
        noise = jitter_std * jax.random.normal(k_jit, xyz.shape)
        xyz = xyz + jnp.where(valid, noise, 0.0)
    point_clouds = jnp.concatenate([xyz, point_clouds[..., 3:]], axis=-1)
    target_vertices = jnp.einsum("bvc,bdc->bvd", target_vertices, rot)
    return point_clouds, target_vertices
