from wireframe_tpu.metrics.hausdorff import hausdorff_distance_line  # noqa: F401
from wireframe_tpu.metrics.ap_calculator import APCalculator  # noqa: F401
from wireframe_tpu.metrics.wed import (  # noqa: F401
    graph_edit_distance,
    compute_edge_indices,
    setdiff_rows,
)
from wireframe_tpu.metrics.rmse import hungarian_rmse, aligned_rmse  # noqa: F401
