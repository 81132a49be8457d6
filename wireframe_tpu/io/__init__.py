from wireframe_tpu.io.obj import load_wireframe, save_wireframe  # noqa: F401
from wireframe_tpu.io.xyz import read_xyz  # noqa: F401
