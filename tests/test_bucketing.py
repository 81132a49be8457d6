"""Bucketed raw-cloud inference: grouping, padding, mask behavior."""

import numpy as np

from wireframe_tpu.data.bucketing import (
    choose_bucket,
    group_by_bucket,
    pad_or_sample,
)


def test_choose_bucket():
    buckets = (2048, 4096, 8192)
    assert choose_bucket(100, buckets) == 2048
    assert choose_bucket(2048, buckets) == 2048
    assert choose_bucket(2049, buckets) == 4096
    assert choose_bucket(9000, buckets) == 8192  # oversized -> largest


def test_pad_or_sample(rng):
    pc = rng.normal(size=(100, 8)).astype(np.float32)
    padded = pad_or_sample(pc, 128, rng)
    assert padded.shape == (128, 8)
    np.testing.assert_array_equal(padded[:100], pc)
    np.testing.assert_array_equal(padded[100:], 0)
    sampled = pad_or_sample(pc, 64, rng)
    assert sampled.shape == (64, 8)
    # sampled rows are a subset of the original
    orig = {tuple(r) for r in pc.round(5).tolist()}
    assert all(tuple(r) in orig for r in sampled.round(5).tolist())


def test_group_by_bucket(rng):
    clouds = [rng.normal(size=(n, 8)) for n in (50, 100, 300, 200, 1000)]
    groups = group_by_bucket(clouds, (128, 256, 512), rng)
    assert set(groups) == {128, 256, 512}
    idxs128, arr128 = groups[128]
    assert idxs128 == [0, 1] and arr128.shape == (2, 128, 8)
    idxs256, _ = groups[256]
    assert idxs256 == [3]  # 200 fits 256
    idxs512, arr512 = groups[512]
    assert idxs512 == [2, 4]  # 300 fits 512; 1000 sampled down to 512
    assert arr512.shape == (2, 512, 8)


def test_group_by_bucket_z_sort_after_downsample():
    """z_sort=True must sort AFTER pad_or_sample: rng.choice returns
    rows in random order, which silently destroyed an earlier sort
    (review finding on the data.z_sort_points path)."""
    import numpy as np

    from wireframe_tpu.data.bucketing import group_by_bucket, z_sort_rows

    rng = np.random.default_rng(0)
    big = rng.normal(size=(300, 8)).astype(np.float32)     # downsampled
    small = rng.normal(size=(60, 8)).astype(np.float32)    # padded
    groups = group_by_bucket([big, small], buckets=(128,),
                             rng=np.random.default_rng(1), z_sort=True)
    idxs, stacked = groups[128]
    for j, i in enumerate(idxs):
        pc = stacked[j]
        valid = np.abs(pc.sum(-1)) > 1e-9
        z = pc[valid][:, 2]
        assert np.all(np.diff(z) >= 0), "valid rows not z-ascending"
        # padding rows (if any) strictly at the end
        if (~valid).any():
            assert not valid[np.argmax(~valid):].any()
    # helper keeps all-zero rows last even when zeros sort before z>0
    mixed = np.zeros((10, 8), np.float32)
    mixed[:4] = rng.normal(size=(4, 8))
    out = z_sort_rows(mixed)
    assert np.abs(out[4:].sum()) == 0.0 and np.abs(out[:4].sum()) > 0.0
