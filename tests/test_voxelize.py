import jax.numpy as jnp
import numpy as np

from sst_tpu.ops.voxelize import dynamic_voxelize, grid_shape_zyx


PCR = (-4.0, -4.0, -1.0, 4.0, 4.0, 3.0)
VS = (0.5, 0.5, 4.0)


def test_grid_shape():
    assert grid_shape_zyx(PCR, VS) == (1, 16, 16)


def test_dynamic_voxelize_matches_numpy(rng):
    p = 200
    pts = rng.uniform(-5, 5, size=(p, 4)).astype(np.float32)
    batch_idx = (rng.rand(p) > 0.5).astype(np.int32)
    valid = rng.rand(p) > 0.1
    vm = dynamic_voxelize(
        jnp.asarray(pts), jnp.asarray(batch_idx), jnp.asarray(valid),
        PCR, VS, max_voxels=256, batch_size=2,
    )
    # numpy reference
    cx = np.floor((pts[:, 0] - PCR[0]) / VS[0]).astype(int)
    cy = np.floor((pts[:, 1] - PCR[1]) / VS[1]).astype(int)
    cz = np.floor((pts[:, 2] - PCR[2]) / VS[2]).astype(int)
    in_range = (
        (cx >= 0) & (cx < 16) & (cy >= 0) & (cy < 16) & (cz >= 0) & (cz < 1) & valid
    )
    np.testing.assert_array_equal(np.asarray(vm.valid), in_range)
    coords = np.asarray(vm.coords)
    np.testing.assert_array_equal(coords[in_range, 0], batch_idx[in_range])
    np.testing.assert_array_equal(coords[in_range, 1], cz[in_range])
    np.testing.assert_array_equal(coords[in_range, 2], cy[in_range])
    np.testing.assert_array_equal(coords[in_range, 3], cx[in_range])
    # every valid point maps to a voxel slot whose coord matches
    seg = np.asarray(vm.point_seg_ids)
    vcoords = np.asarray(vm.voxel_coords)
    for i in np.where(in_range)[0]:
        np.testing.assert_array_equal(vcoords[seg[i]], coords[i])
    # number of distinct voxels matches numpy unique
    tuples = {tuple(c) for c in coords[in_range]}
    assert int(vm.unique.num_unique) == len(tuples)
    assert np.asarray(vm.voxel_valid).sum() == len(tuples)


def test_points_out_of_range_dropped():
    pts = jnp.asarray([[100.0, 0, 0, 0], [0.0, 0.1, 0.2, 0]], jnp.float32)
    vm = dynamic_voxelize(
        pts, jnp.zeros(2, jnp.int32), jnp.ones(2, bool), PCR, VS,
        max_voxels=8, batch_size=1,
    )
    assert not bool(vm.valid[0])
    assert bool(vm.valid[1])
    assert int(vm.unique.num_unique) == 1


def test_hard_voxelize_and_hard_vfes():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sst_tpu.models.vfe import HardSimpleVFE, PillarFeatureNet
    from sst_tpu.ops.voxelize import hard_voxelize

    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(-7, 7, (512, 4)).astype(np.float32))
    bidx = jnp.zeros(512, jnp.int32)
    valid = jnp.ones(512, bool)
    pcr = (-8.0, -8.0, -2.0, 8.0, 8.0, 4.0)
    # z range clamp so points are in range
    pts = pts.at[:, 2].set(jnp.clip(pts[:, 2], -1.9, 3.9))
    voxels, num_points, coords, vvalid = hard_voxelize(
        pts, bidx, valid, pcr, (1.0, 1.0, 6.0), 256, 8, 1
    )
    assert voxels.shape == (256, 8, 4)
    total = int(num_points.sum())
    assert 0 < total <= 512
    # every stored point is a real input point
    stored = np.asarray(voxels).reshape(-1, 4)
    stored = stored[np.abs(stored).sum(1) > 0]
    pset = {tuple(np.round(r, 4)) for r in np.asarray(pts)}
    assert all(tuple(np.round(r, 4)) in pset for r in stored[:50])

    vfe = HardSimpleVFE()
    mean_feats = vfe.apply(vfe.init(jax.random.PRNGKey(0), voxels, num_points),
                           voxels, num_points)
    assert mean_feats.shape == (256, 4)
    # check mean correctness for the fullest voxel
    i = int(np.argmax(np.asarray(num_points)))
    n = int(num_points[i])
    np.testing.assert_allclose(
        np.asarray(mean_feats[i]),
        np.asarray(voxels[i, :n]).mean(0), rtol=1e-5, atol=1e-5)

    pfn = PillarFeatureNet(feat_channels=(16,), voxel_size=(1.0, 1.0, 6.0),
                           point_cloud_range=pcr)
    variables = pfn.init(jax.random.PRNGKey(0), voxels, num_points, coords)
    out = pfn.apply(variables, voxels, num_points, coords)
    assert out.shape == (256, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_canvas_unique_matches_sort_unique():
    """Sort-free canvas unique must produce identical seg ids / keys /
    counts / overflow semantics to the sort-based unique (ranks excluded)."""
    import numpy as np
    from sst_tpu.ops.segment import unique_segments, unique_segments_canvas

    rng = np.random.RandomState(0)
    n, space, cap = 3000, 512, 64
    keys = jnp.asarray(rng.randint(0, space, size=(n,)).astype(np.int32))
    valid = jnp.asarray(rng.rand(n) > 0.1)

    a = unique_segments(keys, valid, cap)
    b = unique_segments_canvas(keys, valid, cap, space)
    np.testing.assert_array_equal(np.asarray(a.seg_ids), np.asarray(b.seg_ids))
    np.testing.assert_array_equal(np.asarray(a.unique_keys),
                                  np.asarray(b.unique_keys))
    np.testing.assert_array_equal(np.asarray(a.counts), np.asarray(b.counts))
    assert int(a.num_unique) == int(b.num_unique)

    # no-overflow case too
    a2 = unique_segments(keys, valid, 600)
    b2 = unique_segments_canvas(keys, valid, 600, space)
    np.testing.assert_array_equal(np.asarray(a2.seg_ids), np.asarray(b2.seg_ids))
    np.testing.assert_array_equal(np.asarray(a2.counts), np.asarray(b2.counts))


def test_dynamic_vfe_extra_sum_rides_cluster_pass(rng):
    """DynamicVFE(extra_sum=...) must return exact per-voxel sums of the
    extra channels and the exact cluster mean (the FSDv2 indicator /
    centroid fusion, models/vfe.py _decorate)."""
    import jax

    from sst_tpu.models.vfe import DynamicVFE

    p = 300
    pts = rng.uniform(-4.2, 4.2, size=(p, 5)).astype(np.float32)
    batch_idx = (rng.rand(p) > 0.5).astype(np.int32)
    valid = rng.rand(p) > 0.15
    extra = (rng.rand(p, 2) > 0.5).astype(np.float32)
    vm = dynamic_voxelize(
        jnp.asarray(pts), jnp.asarray(batch_idx), jnp.asarray(valid),
        PCR, VS, max_voxels=256, batch_size=2,
    )
    vfe = DynamicVFE(feat_channels=(16, 16), voxel_size=VS,
                     point_cloud_range=PCR)
    (feats, aux), _ = jax.jit(
        lambda: vfe.init_with_output(
            jax.random.PRNGKey(0), jnp.asarray(pts), vm, False,
            extra_sum=jnp.asarray(extra)))()
    seg = np.asarray(vm.point_seg_ids)
    ok = np.asarray(vm.valid)
    nvox = int(vm.num_voxel_slots)
    ref_sum = np.zeros((nvox, 2), np.float32)
    ref_xyz = np.zeros((nvox, 3), np.float32)
    ref_cnt = np.zeros(nvox, np.int64)
    for i in np.where(ok)[0]:
        ref_sum[seg[i]] += extra[i]
        ref_xyz[seg[i]] += pts[i, :3]
        ref_cnt[seg[i]] += 1
    np.testing.assert_allclose(np.asarray(aux["extra_sum"]), ref_sum,
                               rtol=1e-5, atol=1e-5)
    occ = ref_cnt > 0
    ref_mean = ref_xyz[occ] / ref_cnt[occ, None]
    np.testing.assert_allclose(np.asarray(aux["cluster_mean"])[occ],
                               ref_mean, rtol=1e-4, atol=1e-4)
    assert feats.shape == (nvox, 16)
