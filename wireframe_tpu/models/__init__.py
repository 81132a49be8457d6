from wireframe_tpu.models.encoder import PointNetEncoder  # noqa: F401
from wireframe_tpu.models.vertex_head import VertexPredictor  # noqa: F401
from wireframe_tpu.models.edge_head import EdgePredictor  # noqa: F401
from wireframe_tpu.models.wireframe import PointCloudToWireframe  # noqa: F401
