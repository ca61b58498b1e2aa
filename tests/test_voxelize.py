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
