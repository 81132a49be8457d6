from wireframe_tpu.losses.wireframe_loss import (  # noqa: F401
    WireframeLossConfig,
    wireframe_loss,
    matching_cost_matrix,
)
