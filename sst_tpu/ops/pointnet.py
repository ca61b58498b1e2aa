"""PointNet++-family neighborhood ops — batched, static shapes.

TPU rebuild of the reference's CUDA ops under mmdet3d/ops/:
  - ball_query/ball_query.py:14  (BallQuery.forward)
  - knn/knn.py:16                (KNN.forward; output [B, k, npoint])
  - interpolate/three_nn.py:10   (ThreeNN)
  - interpolate/three_interpolate.py:8 (ThreeInterpolate)
  - gather_points/gather_points.py     (GatherPoints)
  - group_points/group_points.py:179   (GroupingOperation)

Instead of per-center scan kernels, every op is one dense [npoint, N]
distance matrix (an MXU matmul via the |a-b|^2 expansion) followed by top-k /
argmin — the shapes are static and XLA tiles them onto the MXU. Invalid rows
(padding) are handled with `valid` masks pushing distances to +inf, which the
CUDA originals do implicitly by exact-size tensors.

Gradients: index outputs are non-differentiable (as in the reference);
three_interpolate / gather / grouping are plain gathers, so autodiff provides
the scatter-add backward the reference hand-writes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = 1e10


def square_distance(a, b, b_valid=None):
    """Pairwise squared L2 distance.

    Args: a [..., N, 3]; b [..., M, 3]; b_valid optional [..., M] bool.
    Returns [..., N, M]; invalid b rows read +inf.
    """
    # |a-b|^2 = |a|^2 + |b|^2 - 2 a.b  — the cross term is an MXU matmul.
    d = (
        jnp.sum(a * a, -1)[..., :, None]
        + jnp.sum(b * b, -1)[..., None, :]
        - 2.0 * jnp.einsum("...nc,...mc->...nm", a, b)
    )
    d = jnp.maximum(d, 0.0)
    if b_valid is not None:
        d = jnp.where(b_valid[..., None, :], d, _INF)
    return d


def ball_query(min_radius: float, max_radius: float, sample_num: int,
               xyz, center_xyz, xyz_valid=None):
    """Indices of up to `sample_num` points within a spherical shell.

    Reference: ball_query.py:14 — first `sample_num` in-ball points in index
    order; remaining slots repeat the first in-ball index (0 if the ball is
    empty, matching the zero-initialised CUDA output buffer).

    Args: xyz [B, N, 3]; center_xyz [B, npoint, 3]; xyz_valid [B, N] bool.
    Returns idx [B, npoint, sample_num] int32.
    """
    assert min_radius < max_radius
    d2 = square_distance(center_xyz, xyz, xyz_valid)  # [B, np, N]
    inball = (d2 < max_radius * max_radius) & (d2 >= min_radius * min_radius)
    n = xyz.shape[-2]
    # rank of each in-ball point among its center's in-ball set (index order)
    rank = jnp.cumsum(inball.astype(jnp.int32), axis=-1) - 1  # [B, np, N]
    slot = jnp.where(inball & (rank < sample_num), rank, sample_num)
    src = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), d2.shape)
    # reverse order so the LOWEST index wins each slot under scatter overwrite
    idx = jax.vmap(jax.vmap(
        lambda s, v: jnp.zeros((sample_num + 1,), jnp.int32).at[s[::-1]].set(
            v[::-1], mode="drop")
    ))(slot, src)[..., :sample_num]
    first = idx[..., :1]
    filled = jnp.arange(sample_num) < jnp.minimum(
        inball.sum(-1, keepdims=True), sample_num)
    return jnp.where(filled, idx, first)


def knn(k: int, xyz, center_xyz=None, xyz_valid=None):
    """k nearest neighbours of each center.

    Reference: knn.py:16 — returns idx [B, k, npoint] (transposed layout).
    With a `xyz_valid` mask and fewer than k valid points, the tail slots
    repeat the nearest valid neighbour (ball_query's fill semantics) instead
    of leaking padding-row indices.
    """
    if center_xyz is None:
        center_xyz = xyz
    d2 = square_distance(center_xyz, xyz, xyz_valid)  # [B, np, N]
    neg, idx = jax.lax.top_k(-d2, k)  # ascending distance
    idx = idx.astype(jnp.int32)
    if xyz_valid is not None:
        # slots whose distance is the invalid sentinel fall back to slot 0
        ok = -neg < _INF
        idx = jnp.where(ok, idx, idx[..., :1])
    return jnp.swapaxes(idx, -1, -2)  # [B, k, np]


def three_nn(target, source, source_valid=None):
    """Top-3 nearest source points for every target point.

    Reference: three_nn.py:10. Returns (dist [B, N, 3], idx [B, N, 3]).
    """
    d2 = square_distance(target, source, source_valid)
    neg, idx = jax.lax.top_k(-d2, 3)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx.astype(jnp.int32)


def three_interpolate(features, indices, weight):
    """Weighted interpolation of 3 neighbour features.

    Reference: three_interpolate.py:8.
    Args: features [B, C, M]; indices [B, n, 3]; weight [B, n, 3].
    Returns [B, C, n].
    """
    g = jax.vmap(lambda f, i: f[:, i])(features, indices)  # [B, C, n, 3]
    return jnp.einsum("bcnk,bnk->bcn", g, weight)


def gather_points(features, indices):
    """Gather feature columns. Reference: gather_points.py (GatherPoints).

    Args: features [B, C, N]; indices [B, npoint]. Returns [B, C, npoint].
    """
    return jax.vmap(lambda f, i: f[:, i])(features, indices)


def grouping_operation(features, indices):
    """Group feature columns. Reference: group_points.py:179.

    Args: features [B, C, N]; indices [B, npoint, nsample].
    Returns [B, C, npoint, nsample].
    """
    return jax.vmap(lambda f, i: f[:, i])(features, indices)


def query_and_group(points_xyz, center_xyz, idx, features=None,
                    relative_xyz=True, normalize_xyz=False, radius=None):
    """Group xyz (+features) by precomputed neighbour indices.

    Functional core of group_points.py:11 QueryAndGroup.forward (the module
    wrapper lives with the model code; sampling strategy — ball_query or
    knn — is the caller's choice, as in the reference ctor flags).

    Args: points_xyz [B, N, 3]; center_xyz [B, npoint, 3];
          idx [B, npoint, nsample]; features [B, C, N] or None.
    Returns [B, 3(+C), npoint, nsample].
    """
    xyz_t = jnp.swapaxes(points_xyz, -1, -2)  # [B, 3, N]
    grouped = grouping_operation(xyz_t, idx)  # [B, 3, np, ns]
    if relative_xyz:
        grouped = grouped - jnp.swapaxes(center_xyz, -1, -2)[..., None]
    if normalize_xyz:
        assert radius is not None
        grouped = grouped / radius
    if features is None:
        return grouped
    gf = grouping_operation(features, idx)  # [B, C, np, ns]
    return jnp.concatenate([grouped, gf], axis=1)
