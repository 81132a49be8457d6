"""Machine-checked metric parity against the REFERENCE's own APCalculator.

VERDICT r1 #3: feeding identical decoded predictions through both
implementations and asserting every accumulated counter equal upgrades
"semantics match (I read the code)" to "semantics match (machine-checked)".

The reference module (/root/reference/eval/ap_calculator.py, numpy/scipy
only) is imported at test time for comparison — none of its code is
vendored here.  Known, documented divergence: `average_wed` divides by
the number of accumulated samples here vs the LAST batch's size in the
reference (ap_calculator.py:140,276); asserted explicitly below.
"""

import contextlib
import copy
import importlib.util
import io
import os
import pathlib

import numpy as np
import pytest

from wireframe_tpu.data.building3d import Building3DDataset, edge_endpoint_array
from wireframe_tpu.config import DataConfig
from wireframe_tpu.metrics.ap_calculator import APCalculator

REF_AP = pathlib.Path("/root/reference/eval/ap_calculator.py")
REF_DATA = pathlib.Path("/root/reference/datasets")

pytestmark = pytest.mark.skipif(
    not REF_AP.exists(), reason="reference repo not mounted")


def load_reference_ap():
    spec = importlib.util.spec_from_file_location("ref_ap_calculator", REF_AP)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def synth_predictions(gt_vertices, gt_edges, rng, drop_edges=0.3,
                      noise=0.05, extra_vertices=3):
    """A plausible decoded prediction: noisy GT vertices + spurious ones,
    a subset of GT edges + one wrong edge."""
    n = len(gt_vertices)
    pred_v = gt_vertices + rng.normal(scale=noise, size=gt_vertices.shape)
    spurious = rng.normal(scale=0.8, size=(extra_vertices, 3))
    pred_v = np.concatenate([pred_v, spurious], axis=0)
    keep = rng.random(len(gt_edges)) > drop_edges
    pred_e = np.asarray(gt_edges)[keep].astype(np.int64)
    if n + extra_vertices >= 2:
        wrong = np.array([[n, n + 1]], np.int64)  # edge between spurious pts
        pred_e = (np.concatenate([pred_e, wrong], axis=0)
                  if len(pred_e) else wrong)
    ev = edge_endpoint_array(np.asarray(pred_v, np.float64), pred_e)
    return pred_v, pred_e, ev


def build_batch(samples, rng):
    batch = {
        "predicted_vertices": [], "predicted_edges": [],
        "pred_edges_vertices": [], "wf_vertices": [], "wf_edges": [],
        "wf_edges_vertices": [],
    }
    for kind, gt_v, gt_e in samples:
        gt_ev = edge_endpoint_array(np.asarray(gt_v, np.float64),
                                    np.asarray(gt_e, np.int64))
        if kind == "normal":
            pv, pe, pev = synth_predictions(gt_v, gt_e, rng)
        elif kind == "no_edges":   # corners-only fallback path
            pv = gt_v + rng.normal(scale=0.02, size=gt_v.shape)
            pe = np.zeros((0, 2), np.int64)
            pev = np.zeros((0, 2, 3), np.float64)
        elif kind == "all_far":    # every match beyond threshold
            pv, pe, pev = synth_predictions(
                gt_v + 50.0, gt_e, rng, drop_edges=0.0)
        batch["predicted_vertices"].append(pv)
        batch["predicted_edges"].append(pe)
        batch["pred_edges_vertices"].append(pev)
        batch["wf_vertices"].append(np.asarray(gt_v, np.float64))
        batch["wf_edges"].append(np.asarray(gt_e, np.int64))
        batch["wf_edges_vertices"].append(gt_ev)
    return batch


def real_test_samples():
    cfg = DataConfig(root_dir=str(REF_DATA), num_points=256, augment=False)
    ds = Building3DDataset(cfg, "test")
    rng = np.random.default_rng(0)
    out = []
    for i in range(len(ds)):
        s = ds.get_sample(i, rng=rng, augment_on_host=False)
        out.append(("normal", np.asarray(s["wf_vertices"], np.float64),
                    np.asarray(s["wf_edges"], np.int64)))
    return out


def run_both(batches):
    """Run ours and the reference on deep-copied inputs (the reference
    mutates pred_edges_vertices in place, ap_calculator.py:236-237)."""
    ref_mod = load_reference_ap()
    ours = APCalculator(distance_thresh=1.0)
    theirs = ref_mod.APCalculator(distance_thresh=1.0)
    for b in batches:
        ours.compute_metrics(copy.deepcopy(b))
        with contextlib.redirect_stdout(io.StringIO()):  # ref debug spew
            theirs.compute_metrics(copy.deepcopy(b))
    with contextlib.redirect_stdout(io.StringIO()):
        theirs.output_accuracy()
    return ours.summarize(), theirs.ap_dict, theirs.batch_size


COUNTERS = ("tp_corners", "tp_fp_corners", "tp_fn_corners", "tp_edges",
            "tp_fp_edges", "tp_fn_edges")
RATIOS = ("average_corner_offset", "corners_precision", "corners_recall",
          "corners_f1", "edges_precision", "edges_recall", "edges_f1")


@pytest.mark.skipif(not REF_DATA.exists(), reason="reference data missing")
def test_counters_match_on_real_test_corpus_single_batch():
    """All 8 real test buildings in ONE batch: every counter AND every
    final ratio (incl. average_wed — denominators coincide) equal."""
    batch = build_batch(real_test_samples(), np.random.default_rng(7))
    ours, ref, _ = run_both([batch])
    for k in COUNTERS:
        assert ours[k] == ref[k], f"{k}: {ours[k]} vs {ref[k]}"
    np.testing.assert_allclose(ours["distance"], ref["distance"], rtol=1e-9)
    np.testing.assert_allclose(ours["wed"], ref["wed"], rtol=1e-9)
    for k in RATIOS + ("average_wed",):
        np.testing.assert_allclose(ours[k], ref[k], rtol=1e-9, err_msg=k)


def test_counters_match_on_edge_cases_multi_batch():
    """Synthetic edge cases over TWO batches: the no-edges fallback, a
    perfect prediction (empty leftover-corner sets), and a normal sample.
    Counters equal; average_wed diverges EXACTLY by the documented
    denominator difference (ours: total samples; reference: last batch's
    size)."""
    rng = np.random.default_rng(3)
    sq = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 1.]])
    sq_e = np.array([[0, 1], [1, 2], [2, 3], [0, 3]], np.int64)
    tri = np.array([[0, 0, 0], [2, 0, 1], [1, 2, 0.5]])
    tri_e = np.array([[0, 1], [1, 2], [0, 2]], np.int64)
    b1 = build_batch([("normal", sq, sq_e), ("no_edges", tri, tri_e)], rng)
    # Perfect prediction: all edges positive, every corner explained by a
    # positive edge, so BOTH leftover-corner sets are empty (the
    # remove_corners/setdiff path with zero rows on each side).
    perfect_ev = edge_endpoint_array(sq, sq_e)
    b2 = {
        "predicted_vertices": [sq.copy()],
        "predicted_edges": [sq_e.copy()],
        "pred_edges_vertices": [perfect_ev.copy()],
        "wf_vertices": [sq.copy()],
        "wf_edges": [sq_e.copy()],
        "wf_edges_vertices": [perfect_ev.copy()],
    }
    ours, ref, ref_last_bs = run_both([b1, b2])
    for k in COUNTERS:
        assert ours[k] == ref[k], f"{k}: {ours[k]} vs {ref[k]}"
    np.testing.assert_allclose(ours["distance"], ref["distance"], rtol=1e-9)
    np.testing.assert_allclose(ours["wed"], ref["wed"], rtol=1e-9)
    for k in RATIOS:
        np.testing.assert_allclose(ours[k], ref[k], rtol=1e-9, err_msg=k)
    # Documented average_wed divergence: 3 samples total vs last bs=1.
    assert ref_last_bs == 1
    np.testing.assert_allclose(ours["average_wed"], ours["wed"] / 3.0)
    np.testing.assert_allclose(ref["average_wed"], ref["wed"] / 1.0)


def test_zero_positive_edges_reference_crashes_ours_survives():
    """A sample WITH predicted edges but ZERO within-threshold matches:
    the reference crashes on np.min over an empty axis
    (ap_calculator.py:230-232 — latent bug); ours counts it as
    zero-TP-edges.  Pinned so the intentional divergence stays visible."""
    rng = np.random.default_rng(3)
    sq = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 1.]])
    sq_e = np.array([[0, 1], [1, 2], [2, 3], [0, 3]], np.int64)
    batch = build_batch([("all_far", sq, sq_e)], rng)

    ours = APCalculator(distance_thresh=1.0)
    ours.compute_metrics(copy.deepcopy(batch))
    got = ours.summarize()
    assert got["tp_edges"] == 0 and got["tp_fp_edges"] == len(sq_e) + 1
    assert np.isfinite(got["average_corner_offset"])

    ref_mod = load_reference_ap()
    theirs = ref_mod.APCalculator(distance_thresh=1.0)
    with contextlib.redirect_stdout(io.StringIO()):
        with pytest.raises(ValueError, match="zero-size array"):
            theirs.compute_metrics(copy.deepcopy(batch))
