"""End-to-end eval pipeline on a synthetic corpus: sampled mode, raw
bucketed mode, and .obj emission consistency."""

import numpy as np
import jax
import pytest

from wireframe_tpu.config import Config
from wireframe_tpu.data.building3d import Building3DDataset
from wireframe_tpu.eval.evaluator import (
    decode_predictions,
    evaluate_model,
    predict_bucketed,
)
from wireframe_tpu.io.obj import save_wireframe
from wireframe_tpu.train.state import create_train_state
from wireframe_tpu.train.step import make_forward_fn

from conftest import make_synthetic_sample


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    rng = np.random.default_rng(7)
    root = tmp_path_factory.mktemp("corpus")
    for split, n in (("train", 2), ("test", 3)):
        (root / split / "xyz").mkdir(parents=True)
        (root / split / "wireframe").mkdir(parents=True)
        sizes = [150, 300, 500]
        for i in range(n):
            pc, verts, edges = make_synthetic_sample(
                rng, n_points=sizes[i % 3], n_verts=5)
            np.savetxt(str(root / split / "xyz" / f"{i}.xyz"), pc)
            save_wireframe(verts, edges,
                           str(root / split / "wireframe" / f"{i}.obj"))

    cfg = Config()
    cfg.data.root_dir = str(root)
    cfg.data.num_points = 128
    cfg.data.max_vertices = 10
    cfg.data.point_buckets = (256, 512)
    cfg.model.encoder_hidden_dims = (32, 64)
    cfg.model.encoder_output_dim = 32
    cfg.model.edge_hidden_dim = 32
    cfg.model.edge_num_heads = 2
    cfg.eval.batch_size = 2
    cfg.__post_init__()
    state = create_train_state(cfg, jax.random.PRNGKey(0), (1, 128, 8))
    return cfg, state.params


def test_evaluate_sampled(setup, capsys):
    cfg, params = setup
    ds = Building3DDataset(cfg.data, "test")
    metrics = evaluate_model(cfg, params, ds, verbose=False)
    for key in ("corners_precision", "corners_recall", "corners_f1",
                "edges_precision", "edges_recall", "edges_f1",
                "average_corner_offset", "average_wed"):
        assert key in metrics
        assert np.isfinite(metrics[key])


def test_evaluate_raw_bucketed(setup):
    cfg, params = setup
    ds = Building3DDataset(cfg.data, "test")
    metrics = evaluate_model(cfg, params, ds, verbose=False,
                             raw_points=True)
    assert np.isfinite(metrics["corners_f1"])
    assert metrics["tp_fn_corners"] == 15  # 3 samples x 5 GT vertices


def test_live_corner_filter_changes_only_the_corner_denominator(setup):
    """eval.live_corner_filter counts only live slots as predicted
    corners; GT-side counters and the denominator ordering must hold."""
    import copy

    cfg, params = setup
    cfg_e = copy.deepcopy(cfg)
    cfg_e.model.slot_mask_mode = "existence"
    ds = Building3DDataset(cfg_e.data, "test")
    base = evaluate_model(cfg_e, params, ds, verbose=False)
    cfg_f = copy.deepcopy(cfg_e)
    cfg_f.eval.live_corner_filter = True
    filt = evaluate_model(cfg_f, params, ds, verbose=False)
    # All-slot counting fixes the denominator at V per sample.
    assert base["tp_fp_corners"] == 3 * cfg.model.max_vertices
    assert filt["tp_fp_corners"] <= base["tp_fp_corners"]
    # GT-side counters are untouched by the filter.
    assert filt["tp_fn_corners"] == base["tp_fn_corners"]
    assert filt["tp_fn_edges"] == base["tp_fn_edges"]
    # Prefix mode has no live mask: the flag must be a no-op there.
    cfg_p = copy.deepcopy(cfg)
    cfg_p.eval.live_corner_filter = True
    noop = evaluate_model(cfg_p, params, ds, verbose=False)
    ref = evaluate_model(cfg, params, ds, verbose=False)
    assert noop["tp_fp_corners"] == ref["tp_fp_corners"]


def test_predict_bucketed_order_and_shapes(setup, rng):
    cfg, params = setup
    clouds = [rng.normal(size=(n, 8)).astype(np.float32)
              for n in (100, 400, 200)]
    out = predict_bucketed(cfg, params, clouds)
    assert len(out) == 3
    v = cfg.model.max_vertices
    for r in out:
        assert r["vertices"].shape == (v, 3)
        assert 0 <= r["count"] <= v


def _exact_counter_keys():
    from wireframe_tpu.metrics.ap_calculator import _COUNTER_KEYS

    return _COUNTER_KEYS


def test_pipelined_matches_legacy_exactly(setup):
    """The fused fixed-shape pipeline (eval/pipeline.py) must reproduce
    the legacy evaluate_model(device_hausdorff=True) counters EXACTLY
    when both run the same forward batch shape (the pipeline is the same
    math minus the dispatch/recompile overhead)."""
    import copy

    from wireframe_tpu.eval.pipeline import evaluate_corpus_pipelined

    cfg, params = setup
    for mode in ("prefix", "existence"):
        c = copy.deepcopy(cfg)
        c.model.slot_mask_mode = mode
        ds = Building3DDataset(c.data, "test")
        legacy = evaluate_model(c, params, ds, verbose=False,
                                device_hausdorff=True)
        stats = {}
        fast = evaluate_corpus_pipelined(
            c, params, ds, batch=c.eval.batch_size, qmax=16, emax=16,
            stats=stats)
        assert stats["qmax_overflows"] == 0
        for k in _exact_counter_keys():
            assert fast[k] == legacy[k], (mode, k, fast[k], legacy[k])
        assert fast["edges_f1"] == legacy["edges_f1"]


def test_pipelined_qmax_overflow_falls_back(setup):
    """qmax smaller than the kept-pair count routes those samples through
    the legacy host path — same counters, overflow counted."""
    import copy

    from wireframe_tpu.eval.pipeline import evaluate_corpus_pipelined

    cfg, params = setup
    cfg = copy.deepcopy(cfg)
    # Threshold 0 keeps every live pair, guaranteeing >1 kept pair per
    # sample on the random-init model.
    cfg.eval.edge_confidence_thresh = 0.0
    ds = Building3DDataset(cfg.data, "test")
    legacy = evaluate_model(cfg, params, ds, verbose=False,
                            device_hausdorff=True)
    stats = {}
    fast = evaluate_corpus_pipelined(
        cfg, params, ds, batch=cfg.eval.batch_size, qmax=1, emax=16,
        stats=stats)
    for k in _exact_counter_keys():
        assert fast[k] == legacy[k], (k, fast[k], legacy[k])
    # The random-init model predicts >1 edge on at least one sample.
    assert stats["qmax_overflows"] >= 1


def test_pipelined_emax_overflow_falls_back(setup):
    """A sample with more GT edges than the fixed emax pad must not be
    fatal: its distances come from the legacy device helper instead, so
    counters still match the legacy run exactly."""
    import copy

    from wireframe_tpu.eval.pipeline import evaluate_corpus_pipelined

    cfg, params = setup
    cfg = copy.deepcopy(cfg)
    ds = Building3DDataset(cfg.data, "test")
    legacy = evaluate_model(cfg, params, ds, verbose=False,
                            device_hausdorff=True)
    stats = {}
    fast = evaluate_corpus_pipelined(
        cfg, params, ds, batch=cfg.eval.batch_size, qmax=16, emax=2,
        stats=stats)
    for k in _exact_counter_keys():
        assert fast[k] == legacy[k], (k, fast[k], legacy[k])
    # The synthetic buildings have >2 GT edges, so every sample overflows.
    assert stats["emax_overflows"] == len(ds)


def test_pipelined_sharded_rejects_forward_fn(setup):
    """pipelined=True compiles its own fused program; a caller-supplied
    forward_fn cannot be honored and must raise, not be dropped."""
    from wireframe_tpu.eval.distributed import evaluate_model_sharded

    cfg, params = setup
    ds = Building3DDataset(cfg.data, "test")
    with pytest.raises(ValueError, match="forward_fn"):
        evaluate_model_sharded(cfg, params, ds, n_shards=2,
                               pipelined=True,
                               forward_fn=lambda p, c, t: None)


def test_pipelined_sharded_equals_plain(setup):
    """Sharded pipelined eval merges to the same counters as the plain
    pipelined run (both ride one compiled program at one batch shape)."""
    from wireframe_tpu.eval.distributed import evaluate_model_sharded
    from wireframe_tpu.eval.pipeline import evaluate_corpus_pipelined

    cfg, params = setup
    ds = Building3DDataset(cfg.data, "test")
    kw = dict(batch=cfg.eval.batch_size, qmax=16, emax=16)
    plain = evaluate_corpus_pipelined(cfg, params, ds, **kw)
    sharded = evaluate_model_sharded(cfg, params, ds, n_shards=2,
                                     pipelined=True, pipeline_kwargs=kw)
    for k in _exact_counter_keys():
        assert sharded[k] == plain[k], (k, sharded[k], plain[k])


def test_pipelined_sharded_empty_shards(setup):
    """More shards than samples: the single-pass router must skip empty
    shards (no empty APCalculator in the merge) and still match plain —
    the production shard count (8) with a tiny corpus hits this."""
    from wireframe_tpu.eval.distributed import evaluate_model_sharded
    from wireframe_tpu.eval.pipeline import evaluate_corpus_pipelined

    cfg, params = setup
    ds = Building3DDataset(cfg.data, "test")
    assert len(ds) < 8
    kw = dict(batch=cfg.eval.batch_size, qmax=16, emax=16)
    plain = evaluate_corpus_pipelined(cfg, params, ds, **kw)
    sharded = evaluate_model_sharded(cfg, params, ds, n_shards=8,
                                     pipelined=True, pipeline_kwargs=kw)
    for k in _exact_counter_keys():
        assert sharded[k] == plain[k], (k, sharded[k], plain[k])


def test_decode_predictions_threshold(rng):
    from wireframe_tpu.ops.pairs import num_pairs

    v = 6
    verts = rng.normal(size=(v, 3))
    probs = np.zeros(num_pairs(v))
    probs[0] = 0.9   # pair (0,1)
    probs[5] = 0.7   # pair (1,2)
    dec = decode_predictions(verts, probs, dynamic_count=3, max_vertices=v)
    np.testing.assert_array_equal(dec["edges"], [[0, 1], [1, 2]])
    assert dec["edges_vertices"].shape == (2, 2, 3)
    # z-descending per edge
    assert (dec["edges_vertices"][:, 0, 2]
            >= dec["edges_vertices"][:, 1, 2]).all()
