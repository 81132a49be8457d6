"""Config tree: yaml loading (both formats), overrides, consistency."""

import pytest

from wireframe_tpu.config import Config, load_config


def test_defaults_are_reference_regime():
    cfg = Config()
    assert cfg.train.batch_size == 3
    assert cfg.train.num_epochs == 1000
    assert cfg.train.learning_rate == 1e-3
    assert (cfg.train.vertex_weight, cfg.train.edge_weight,
            cfg.train.existence_weight) == (3.0, 1.0, 1.5)
    assert cfg.data.num_points == 2560
    assert cfg.eval.distance_thresh == 1.0
    assert cfg.model.input_dim == 8


def test_example_yaml_round_trips():
    cfg = load_config("configs/default.yaml")
    ref = Config()
    assert cfg.model.encoder_hidden_dims == ref.model.encoder_hidden_dims
    assert cfg.train.num_epochs == ref.train.num_epochs
    assert cfg.data.point_buckets == ref.data.point_buckets


def test_reference_format_yaml(tmp_path):
    p = tmp_path / "ref.yaml"
    p.write_text(
        "Building3D:\n  root_dir: '/x'\n  num_points: 1024\n"
        "  use_color: True\n  use_intensity: False\n"
        "  normalize: True\n  augment: False\n")
    cfg = load_config(str(p))
    assert cfg.data.root_dir == "/x"
    assert cfg.data.num_points == 1024
    assert cfg.data.augment is False
    assert cfg.model.input_dim == 7  # color without intensity


def test_overrides_and_sync():
    cfg = load_config(None, ["data.max_vertices=32",
                             "train.learning_rate=5e-4",
                             "model.use_pallas_encoder=true"])
    assert cfg.data.max_vertices == 32
    assert cfg.model.max_vertices == 32  # kept in sync
    assert cfg.train.learning_rate == 5e-4
    assert cfg.model.use_pallas_encoder is True


def test_unknown_override_rejected():
    with pytest.raises(KeyError):
        load_config(None, ["train.nope=1"])


def test_tuple_override():
    cfg = load_config(None, ["data.point_buckets=512,1024"])
    assert cfg.data.point_buckets == (512, 1024)
