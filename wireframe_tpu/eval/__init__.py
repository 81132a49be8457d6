from wireframe_tpu.eval.evaluator import evaluate_model, decode_predictions  # noqa: F401
