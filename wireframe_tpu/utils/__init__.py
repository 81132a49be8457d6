from wireframe_tpu.utils.trees import tree_size_bytes  # noqa: F401
