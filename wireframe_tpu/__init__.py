"""wireframe_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for
point-cloud → 3D building-wireframe prediction.

Re-designed from scratch with the capabilities of the reference PyTorch
pipeline (cansdev/wireframe-3d-prediction): Building3D data ingest,
PointNet-style encoder, vertex + edge prediction heads, Hungarian-matched
wireframe loss, and the full Building3D evaluation stack (ACO / corner &
edge P/R/F1 / WED) — but built TPU-first:

- fixed static shapes everywhere (point buckets, vertex slots, pair slots)
  with masks instead of ragged Python loops,
- one jitted train step with the assignment solver ON DEVICE
  (batched Jonker-Volgenant LSA, `wireframe_tpu.ops.lsa`),
- a fused Pallas kernel for the per-point MLP + masked pooling hot path,
- `jax.sharding.Mesh` + pjit/shard_map parallelism (data-parallel batch
  axis, optional point-axis sharding with ICI collectives).
"""

__version__ = "0.2.0"

from wireframe_tpu.config import Config, load_config  # noqa: F401
from wireframe_tpu.serve import WireframePredictor  # noqa: F401
