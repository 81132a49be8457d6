from wireframe_tpu.train.state import TrainState, create_train_state  # noqa: F401
from wireframe_tpu.train.step import make_train_step, make_forward_fn  # noqa: F401
from wireframe_tpu.train.loop import train_model  # noqa: F401
