from wireframe_tpu.data.building3d import (  # noqa: F401
    Building3DDataset,
    build_dataset,
    collate_fixed,
)
from wireframe_tpu.data.loader import (  # noqa: F401
    BatchLoader,
    MixedBatchLoader,
)
