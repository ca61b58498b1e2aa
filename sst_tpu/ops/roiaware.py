"""RoI-aware point pooling: rasterize each roi's interior points onto a
fixed (gx, gy, gz) grid of sub-voxels with max/avg reduction.

TPU rebuild of the reference's roiaware_pool3d CUDA extension
(/root/reference/mmdet3d/ops/roiaware_pool3d/ — RoIAwarePool3d, used by
PartA2-style refinement): the pairing reuses dynamic_point_pool's static
[R, K] layout; the per-roi grid scatter is one segment_reduce over
(roi, sub-voxel) slots.
"""

from __future__ import annotations

import jax.numpy as jnp

from sst_tpu.models.fsd.roi_head import _local_frame, dynamic_point_pool
from sst_tpu.ops.segment import segment_reduce


def roiaware_pool3d(points_xyz, feats, pts_valid, pts_batch, rois, roi_valid,
                    roi_batch, out_size=(4, 4, 4), mode: str = "max",
                    max_inbox_point: int = 256):
    """Returns [R, gx, gy, gz, C] pooled features (zeros where empty —
    matching the CUDA kernel's zero-initialized output)."""
    gx, gy, gz = out_size
    r = rois.shape[0]
    k = max_inbox_point
    pool = dynamic_point_pool(points_xyz, pts_valid, pts_batch, rois,
                              roi_valid, roi_batch, extra_wlh=(0.0, 0.0, 0.0),
                              max_inbox_point=k)
    flat_idx = pool["idx"].reshape(-1)
    pv = pool["valid"].reshape(-1)
    pts = points_xyz[flat_idx]
    f = feats[flat_idx]
    proi = jnp.repeat(rois, k, axis=0)
    lw, ll, lz = _local_frame(pts, proi)
    # local coords → sub-voxel index; lw spans w (gx bins), ll spans l (gy)
    ix = jnp.clip(((lw / jnp.maximum(proi[:, 3], 1e-4) + 0.5) * gx), 0, gx - 1e-4).astype(jnp.int32)
    iy = jnp.clip(((ll / jnp.maximum(proi[:, 4], 1e-4) + 0.5) * gy), 0, gy - 1e-4).astype(jnp.int32)
    iz = jnp.clip(((lz / jnp.maximum(proi[:, 5], 1e-4) + 0.5) * gz), 0, gz - 1e-4).astype(jnp.int32)
    rid = jnp.repeat(jnp.arange(r, dtype=jnp.int32), k)
    slot = ((rid * gx + ix) * gy + iy) * gz + iz
    slot = jnp.where(pv, slot, r * gx * gy * gz)
    out = segment_reduce(f, slot, r * gx * gy * gz, mode)
    return out.reshape(r, gx, gy, gz, -1)
