"""Full torch->flax weight transplantation parity (VERDICT r1 #5).

Builds the REFERENCE PyTorch model (imported from /root/reference, CPU),
transplants its weights — including the packed-QKV attention split — into
our flax reference-parity model, and asserts the forward outputs match.
This is the machinery that demonstrates *trained-model* parity: any
reference `trained_model.pth` can now be evaluated in this framework.
"""

import pathlib
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = pathlib.Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not (REF / "models" / "PointCloudToWireframe.py").exists(),
    reason="reference repo not mounted")


@pytest.fixture(scope="module")
def torch_model_and_inputs():
    import torch

    sys.path.insert(0, str(REF))
    from models.PointCloudToWireframe import PointCloudToWireframe as TorchModel

    torch.manual_seed(0)
    v = 16
    model = TorchModel(input_dim=8, max_vertices=v)
    model.eval()

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 128, 8)).astype(np.float32)
    counts = np.array([5, 9], np.int64)
    with torch.no_grad():
        # One forward materializes the lazy point_pool_proj
        # (VertexPredictor.py:94-97) so it lands in the state_dict.
        out = model(torch.from_numpy(x), torch.from_numpy(counts))
    sd = {k: np.asarray(t.detach()) for k, t in model.state_dict().items()}
    return model, sd, x, counts, out, v


def build_flax(v):
    from wireframe_tpu.config import Config

    cfg = Config()
    cfg.data.max_vertices = v
    cfg.model.compute_dtype = "float32"
    cfg.model.use_pallas_encoder = False
    cfg.__post_init__()
    return cfg


def test_transplanted_forward_matches_reference(torch_model_and_inputs):
    from wireframe_tpu.models.wireframe import PointCloudToWireframe
    from wireframe_tpu.train.checkpoint import torch_to_flax_params

    torch_model, sd, x, counts, torch_out, v = torch_model_and_inputs
    cfg = build_flax(v)
    params = torch_to_flax_params(sd, num_heads=cfg.model.edge_num_heads)

    model = PointCloudToWireframe(cfg.model)
    # Structure check: transplanted tree must initialize-apply cleanly.
    out = model.apply({"params": params}, jnp.asarray(x), None, train=False)

    ours_v = np.asarray(out["vertices"])
    ref_v = np.asarray(torch_out["vertices"].detach())
    np.testing.assert_allclose(ours_v, ref_v, atol=2e-3, rtol=1e-3)

    ours_p = np.asarray(out["existence_probabilities"])
    ref_p = np.asarray(torch_out["existence_probabilities"].detach())
    np.testing.assert_allclose(ours_p, ref_p, atol=1e-3)

    # Dynamic counts agree -> both models decode the same live prefix.
    ref_counts = np.asarray(torch_out["actual_vertex_counts"])
    np.testing.assert_array_equal(
        np.asarray(out["actual_vertex_counts"]), ref_counts)

    # Edge probabilities: the reference enumerates C(count,2) prefix pairs
    # per sample in lexicographic order — exactly the subsequence of our
    # static global pair axis with both endpoints < count (ops/pairs.py).
    from wireframe_tpu.ops.pairs import triu_pairs_np

    ref_edges = np.asarray(torch_out["edge_probs"].detach())
    pairs = triu_pairs_np(v)
    for b in range(x.shape[0]):
        c = int(ref_counts[b])
        keep = pairs[:, 1] < c
        ours_e = np.asarray(out["edge_probs"])[b][keep]
        n_pairs = c * (c - 1) // 2
        np.testing.assert_allclose(
            ours_e, ref_edges[b][:n_pairs], atol=2e-3,
            err_msg=f"sample {b} prefix pairs")


def test_transplant_requires_materialized_lazy_layer():
    """A state_dict saved WITHOUT a prior forward lacks point_pool_proj;
    the importer must fail loudly, not silently drop the layer."""
    import torch

    sys.path.insert(0, str(REF))
    from models.PointCloudToWireframe import PointCloudToWireframe as TorchModel

    from wireframe_tpu.train.checkpoint import torch_to_flax_params

    torch.manual_seed(0)
    model = TorchModel(input_dim=8, max_vertices=8)
    sd = {k: np.asarray(t.detach()) for k, t in model.state_dict().items()}
    assert "vertex_predictor.point_pool_proj.weight" not in sd
    with pytest.raises(KeyError, match="point_pool_proj"):
        torch_to_flax_params(sd)


def test_pth_roundtrip(tmp_path, torch_model_and_inputs):
    """torch.save -> load_torch_checkpoint_as_params end-to-end."""
    import torch

    from wireframe_tpu.train.checkpoint import load_torch_checkpoint_as_params

    torch_model, sd, x, counts, torch_out, v = torch_model_and_inputs
    path = str(tmp_path / "trained_model.pth")
    torch.save(torch_model.state_dict(), path)
    params, max_vertices = load_torch_checkpoint_as_params(path)
    assert max_vertices == v
    assert params["encoder"]["stage0_w"].shape == (8, 512)
    assert params["edge_predictor"]["attention"]["query"]["kernel"].shape \
        == (512, 8, 64)


@pytest.mark.skipif(not (REF / "datasets").exists(),
                    reason="reference corpus missing")
@pytest.mark.slow
def test_trained_model_eval_reproduction(tmp_path):
    """Train the reference torch model briefly on real data, transplant,
    and assert OUR eval pipeline reproduces the torch model's decoded
    predictions and Building3D metrics (VERDICT r1 #5 'done' criterion)."""
    import torch

    sys.path.insert(0, str(REF))
    from models.PointCloudToWireframe import PointCloudToWireframe as TorchModel

    from wireframe_tpu.config import Config
    from wireframe_tpu.data.building3d import (
        Building3DDataset,
        collate_fixed,
        edge_endpoint_array,
    )
    from wireframe_tpu.metrics.ap_calculator import APCalculator
    from wireframe_tpu.models.wireframe import PointCloudToWireframe
    from wireframe_tpu.ops.pairs import pairs_from_mask, triu_pairs_np
    from wireframe_tpu.train.checkpoint import torch_to_flax_params

    v, n_pts = 16, 1024
    cfg = Config()
    cfg.data.root_dir = str(REF / "datasets")
    cfg.data.num_points = n_pts
    cfg.data.max_vertices = v
    cfg.data.augment = False
    cfg.data.scale_intensity = False  # reference parity: raw intensity
    cfg.model.compute_dtype = "float32"
    cfg.__post_init__()

    # --- brief torch training on one fixed batch (reference regime) ---
    torch.manual_seed(0)
    ds = Building3DDataset(cfg.data, "train")
    rng = np.random.default_rng(0)
    samples = [ds.get_sample(i, rng=rng, augment_on_host=False)
               for i in range(3)]
    batch = collate_fixed(samples, v)
    pc = torch.from_numpy(np.asarray(batch["point_clouds"], np.float32))
    tv = torch.from_numpy(np.asarray(batch["target_vertices"], np.float32))
    counts = torch.from_numpy(np.asarray(batch["vertex_counts"], np.int64))

    model = TorchModel(input_dim=8, max_vertices=v)
    model.train()
    opt = None
    for step in range(12):
        out = model(pc, counts)
        loss = torch.nn.functional.smooth_l1_loss(out["vertices"], tv)
        if opt is None:  # after lazy layer exists (first forward)
            opt = torch.optim.Adam(model.parameters(), lr=1e-3)
        opt.zero_grad()
        loss.backward()
        opt.step()
    model.eval()

    # --- transplant ---
    sd = {k: np.asarray(t.detach()) for k, t in model.state_dict().items()}
    params = torch_to_flax_params(sd)
    flax_model = PointCloudToWireframe(cfg.model)

    # --- identical eval inputs through both models -> both AP stacks ---
    test_ds = Building3DDataset(cfg.data, "test")
    rng = np.random.default_rng(1)
    test_samples = [test_ds.get_sample(i, rng=rng, augment_on_host=False)
                    for i in range(len(test_ds))]
    tb = collate_fixed(test_samples, v)
    x = np.asarray(tb["point_clouds"], np.float32)

    with torch.no_grad():
        t_out = model(torch.from_numpy(x), None)
    f_out = flax_model.apply({"params": params}, jnp.asarray(x), None,
                             train=False)

    t_counts = np.asarray(t_out["actual_vertex_counts"])
    f_counts = np.asarray(f_out["actual_vertex_counts"])
    np.testing.assert_array_equal(f_counts, t_counts)

    ap_t, ap_f = APCalculator(1.0), APCalculator(1.0)
    pairs = triu_pairs_np(v)
    for side, out_d, ap in (("torch", t_out, ap_t), ("flax", f_out, ap_f)):
        verts = np.asarray(out_d["vertices"] if side == "flax"
                           else out_d["vertices"].detach())
        probs_all = np.asarray(out_d["edge_probs"] if side == "flax"
                               else out_d["edge_probs"].detach())
        apb = {k: [] for k in ("predicted_vertices", "predicted_edges",
                               "pred_edges_vertices", "wf_vertices",
                               "wf_edges", "wf_edges_vertices")}
        for b in range(len(test_samples)):
            c = int(t_counts[b])
            if side == "flax":
                edges = pairs_from_mask(probs_all[b], c, v, 0.5)
            else:
                # Reference decode: C(c,2) prefix pairs, same lex order.
                keep_pairs = pairs[pairs[:, 1] < c]
                n_pairs = c * (c - 1) // 2
                p = probs_all[b][:n_pairs]
                edges = keep_pairs[p > 0.5].astype(np.int64)
            ev = edge_endpoint_array(np.asarray(verts[b], np.float64), edges)
            gt_v = test_samples[b]["wf_vertices"]
            gt_e = test_samples[b]["wf_edges"].astype(np.int64)
            apb["predicted_vertices"].append(verts[b])
            apb["predicted_edges"].append(edges)
            apb["pred_edges_vertices"].append(ev)
            apb["wf_vertices"].append(gt_v)
            apb["wf_edges"].append(gt_e)
            apb["wf_edges_vertices"].append(
                edge_endpoint_array(np.asarray(gt_v, np.float64), gt_e))
        ap.compute_metrics(apb)

    mt, mf = ap_t.summarize(), ap_f.summarize()
    for key in ("tp_corners", "tp_fp_corners", "tp_fn_corners", "tp_edges",
                "tp_fp_edges", "tp_fn_edges"):
        assert mf[key] == mt[key], f"{key}: flax {mf[key]} vs torch {mt[key]}"
    for key in ("average_corner_offset", "corners_f1", "edges_f1",
                "average_wed"):
        np.testing.assert_allclose(mf[key], mt[key], rtol=1e-3, atol=1e-4,
                                   err_msg=key)
