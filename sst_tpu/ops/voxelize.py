"""Dynamic (uncapped) voxelization as pure XLA arithmetic.

TPU-native equivalent of the reference CUDA ``voxel_layer``
(mmdet3d/ops/voxel/src/voxelization_cuda.cu) used in dynamic mode
(max_num_points=-1, max_voxels=(-1,-1)) by every SST/FSD detector
(mmdet3d/models/detectors/dynamic_voxelnet.py:58-99,
 single_stage_fsd.py:208-226).

A point cloud arrives as a padded [N, C] array (N = static cap, first three
channels x,y,z) with a batch index per point and a validity mask. Points
outside ``point_cloud_range`` become invalid, exactly like the reference's
coord==-1 filtering. Voxel identity = linearized (batch, z, y, x) key fed to
``unique_segments``.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import struct

from sst_tpu.ops.segment import UniqueResult, unique_segments


def grid_shape_zyx(point_cloud_range: Sequence[float], voxel_size: Sequence[float]):
    """Static (nz, ny, nx) grid shape, reference rounding semantics
    (voxel_encoder.py:196-201 uses round())."""
    pcr = point_cloud_range
    nx = int(round((pcr[3] - pcr[0]) / voxel_size[0]))
    ny = int(round((pcr[4] - pcr[1]) / voxel_size[1]))
    nz = int(round((pcr[5] - pcr[2]) / voxel_size[2]))
    return (nz, ny, nx)


@struct.dataclass
class VoxelMapping:
    """Point→voxel assignment with statically-capped voxel slots.

    Attributes:
      coords: [P, 4] int32 (b, z, y, x) per point; -1 rows for invalid points.
      keys: [P] int32 linearized voxel key per point.
      valid: [P] bool — point is inside range AND was a real (non-pad) point.
      unique: UniqueResult over keys (seg_ids map points→voxel slots).
      voxel_coords: [V, 4] int32 (b, z, y, x) per voxel slot; -1 for unused.
      voxel_valid: [V] bool.
      grid: static (nz, ny, nx).
      batch_size: static int.
    """

    coords: jax.Array
    keys: jax.Array
    valid: jax.Array
    unique: UniqueResult
    voxel_coords: jax.Array
    voxel_valid: jax.Array
    grid: tuple = struct.field(pytree_node=False)
    batch_size: int = struct.field(pytree_node=False)

    @property
    def num_voxel_slots(self) -> int:
        return self.voxel_coords.shape[0]

    @property
    def point_seg_ids(self) -> jax.Array:
        return self.unique.seg_ids


def compute_voxel_coords(
    xyz: jax.Array,
    batch_idx: jax.Array,
    valid: jax.Array,
    point_cloud_range: Sequence[float],
    voxel_size: Sequence[float],
) -> tuple[jax.Array, jax.Array]:
    """Per-point (b, z, y, x) voxel coords + in-range mask."""
    pcr = jnp.asarray(point_cloud_range, jnp.float32)
    vs = jnp.asarray(voxel_size, jnp.float32)
    nz, ny, nx = grid_shape_zyx(point_cloud_range, voxel_size)
    cx = jnp.floor((xyz[:, 0] - pcr[0]) / vs[0]).astype(jnp.int32)
    cy = jnp.floor((xyz[:, 1] - pcr[1]) / vs[1]).astype(jnp.int32)
    cz = jnp.floor((xyz[:, 2] - pcr[2]) / vs[2]).astype(jnp.int32)
    in_range = (
        (cx >= 0) & (cx < nx) & (cy >= 0) & (cy < ny) & (cz >= 0) & (cz < nz) & valid
    )
    coords = jnp.stack([batch_idx.astype(jnp.int32), cz, cy, cx], axis=-1)
    coords = jnp.where(in_range[:, None], coords, -1)
    return coords, in_range


def linearize_coords(coords: jax.Array, grid: tuple, valid: jax.Array) -> jax.Array:
    """(b,z,y,x) → int32 key. Caller guarantees batch*nz*ny*nx < 2**31."""
    nz, ny, nx = grid
    b, z, y, x = coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]
    key = ((b * nz + z) * ny + y) * nx + x
    return jnp.where(valid, key, -1).astype(jnp.int32)


def delinearize_key(keys: jax.Array, grid: tuple, valid: jax.Array) -> jax.Array:
    nz, ny, nx = grid
    x = keys % nx
    r = keys // nx
    y = r % ny
    r = r // ny
    z = r % nz
    b = r // nz
    coords = jnp.stack([b, z, y, x], axis=-1).astype(jnp.int32)
    return jnp.where(valid[:, None], coords, -1)


@functools.partial(
    jax.jit,
    static_argnames=("point_cloud_range", "voxel_size", "max_voxels",
                     "max_points_per_voxel", "batch_size"),
)
def hard_voxelize(
    points: jax.Array,
    batch_idx: jax.Array,
    points_valid: jax.Array,
    point_cloud_range: tuple,
    voxel_size: tuple,
    max_voxels: int,
    max_points_per_voxel: int,
    batch_size: int,
):
    """Hard voxelization (fixed per-voxel point capacity, reference
    ops/voxel/src/voxelization_cuda.cu:110 hard mode): returns
    (voxels [V, T, C], num_points [V], coords [V, 4], voxel_valid [V]).

    TPU formulation: the dynamic mapping's per-voxel rank (one sort) IS the
    slot index; points beyond the cap are dropped exactly like the CUDA
    kernel's first-come capacity rule (ordering differs only by the stable
    sort vs atomic race, which the reference does not define either)."""
    vm = dynamic_voxelize(points, batch_idx, points_valid, point_cloud_range,
                          voxel_size, max_voxels, batch_size, need_ranks=True)
    t = max_points_per_voxel
    seg = vm.unique.seg_ids
    rank = vm.unique.ranks
    keep = vm.valid & (rank < t) & (seg < max_voxels)
    slot = jnp.where(keep, seg * t + rank, max_voxels * t)
    c = points.shape[-1]
    voxels = jnp.zeros((max_voxels * t + 1, c), points.dtype).at[slot].set(
        jnp.where(keep[:, None], points, 0.0), mode="drop"
    )[:-1].reshape(max_voxels, t, c)
    num_points = jnp.minimum(vm.unique.counts, t)
    return voxels, num_points, vm.voxel_coords, vm.voxel_valid


@functools.partial(
    jax.jit,
    static_argnames=("point_cloud_range", "voxel_size", "max_voxels",
                     "batch_size", "need_ranks"),
)
def dynamic_voxelize(
    points: jax.Array,
    batch_idx: jax.Array,
    points_valid: jax.Array,
    point_cloud_range: tuple,
    voxel_size: tuple,
    max_voxels: int,
    batch_size: int,
    need_ranks: bool = False,
) -> VoxelMapping:
    """Assign every point to a voxel; no per-voxel point cap (dynamic mode).

    Args:
      points: [P, C] padded points, xyz first.
      batch_idx: [P] int32 sample index within the batch.
      points_valid: [P] bool.
      max_voxels: static cap on distinct voxels in the whole batch.
      need_ranks: set True when the caller reads ``unique.ranks`` (the hard
        voxelizer's slot assignment). The default dynamic-VFE consumers only
        need seg ids, which the sort-free canvas unique produces 3-5x faster
        for grids up to 16M cells (segment.py unique_segments_canvas).
    """
    grid = grid_shape_zyx(point_cloud_range, voxel_size)
    nz, ny, nx = grid
    key_space = batch_size * nz * ny * nx
    assert key_space < 2**31, "int32 voxel key overflow; shrink grid"
    coords, valid = compute_voxel_coords(
        points[:, :3], batch_idx, points_valid, point_cloud_range, voxel_size
    )
    keys = linearize_coords(coords, grid, valid)
    # canvas unique only for SMALL key spaces (pillar / virtual grids): at
    # ~12M cells (the 3D segmentor grid) the prefix sum costs what the sort
    # saved (measured flat), while at <=2M it is near-free.
    if need_ranks or key_space > (1 << 21):
        uniq = unique_segments(keys, valid, max_voxels)
    else:
        from sst_tpu.ops.segment import unique_segments_canvas

        uniq = unique_segments_canvas(keys, valid, max_voxels, key_space)
    voxel_valid = uniq.unique_keys != jnp.iinfo(jnp.int32).max
    voxel_coords = delinearize_key(uniq.unique_keys, grid, voxel_valid)
    return VoxelMapping(
        coords=coords,
        keys=keys,
        valid=valid,
        unique=uniq,
        voxel_coords=voxel_coords,
        voxel_valid=voxel_valid,
        grid=grid,
        batch_size=batch_size,
    )
