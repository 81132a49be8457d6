from wireframe_tpu.viz.plots import (  # noqa: F401
    plot_point_cloud,
    plot_wireframe,
    plot_prediction_comparison,
    plot_training_loss,
    plot_edge_probabilities,
)
