"""Max-IoU anchor↔gt assignment (mmdet MaxIoUAssigner semantics) with
anchor-chunked IoU computation to bound memory on large BEV anchor grids
(SST: 468*468*2 anchors/class — the reference computes the full [num_gt,
num_anchors] matrix on GPU, train_mixins.py:8-101; here we stream chunks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG = -1
IGNORE = -2


@functools.partial(
    jax.jit, static_argnames=("iou_fn", "chunk", "pos_thr", "neg_thr", "min_pos_iou")
)
def max_iou_assign(
    anchors,
    gts,
    gt_valid,
    pos_thr: float,
    neg_thr: float,
    min_pos_iou: float,
    iou_fn,
    chunk: int = 32768,
):
    """Assign each anchor to a gt box.

    Args:
      anchors: [A, 7].
      gts: [G, 7+] padded gt boxes.
      gt_valid: [G] bool.
      iou_fn: pairwise fn (a_boxes, b_boxes) -> [n, G] IoU.

    Returns:
      assigned: [A] int32 — gt index, NEG (-1) or IGNORE (-2).
      max_iou: [A] per-anchor best IoU.
    """
    a = anchors.shape[0]
    g = gts.shape[0]
    pad = (-a) % chunk
    anchors_p = jnp.concatenate([anchors, jnp.zeros((pad, anchors.shape[1]), anchors.dtype)])
    chunks = anchors_p.reshape(-1, chunk, anchors.shape[1])

    def per_chunk(ch):
        iou = iou_fn(ch, gts[:, :7])
        iou = jnp.where(gt_valid[None, :], iou, -1.0)
        amax = iou.max(axis=1)
        aarg = iou.argmax(axis=1)
        gmax = iou.max(axis=0)  # per-gt best within this chunk
        return amax, aarg.astype(jnp.int32), gmax, iou

    # pass 1: per-anchor max/argmax and global per-gt max
    amax_l, aarg_l, gmax_l = [], [], []
    def scan_body(carry, ch):
        amax, aarg, gmax, _ = per_chunk(ch)
        return jnp.maximum(carry, gmax), (amax, aarg)

    gt_best, (amax_c, aarg_c) = jax.lax.scan(
        scan_body, jnp.full((g,), -1.0), chunks
    )
    max_iou = amax_c.reshape(-1)[:a]
    argmax_gt = aarg_c.reshape(-1)[:a]

    assigned = jnp.full((a,), IGNORE, jnp.int32)
    assigned = jnp.where(max_iou < neg_thr, NEG, assigned)
    assigned = jnp.where(max_iou >= pos_thr, argmax_gt, assigned)

    # pass 2: low-quality match — any anchor achieving a gt's best IoU gets
    # that gt (gt_max_assign_all=True mmdet default), if best >= min_pos_iou.
    def scan_body2(carry, xs):
        i, ch = xs
        _, _, _, iou = per_chunk(ch)
        hit = (iou == gt_best[None, :]) & (gt_best[None, :] >= min_pos_iou) & gt_valid[None, :]
        any_hit = hit.any(axis=1)
        which = hit.argmax(axis=1).astype(jnp.int32)
        return carry, (any_hit, which)

    _, (hit_c, which_c) = jax.lax.scan(
        scan_body2, None, (jnp.arange(chunks.shape[0]), chunks)
    )
    hit = hit_c.reshape(-1)[:a]
    which = which_c.reshape(-1)[:a]
    assigned = jnp.where(hit, which, assigned)
    return assigned, max_iou


def gt_fg_points_mask(points_xyz, batch_idx, valid, gt_boxes, gt_labels,
                      gt_valid, cls: int | None = None, chunk: int = 16384):
    """Per-point "inside a (same-class) gt box of its sample" mask.

    The reference's add_gt_fg_points / get_batched_gt_fg_mask
    (single_stage_fsd.py:776-796, single_stage_fsd_v2.py:250): points the
    segmentor missed but that lie inside a gt box are injected as fg during
    training. cls=None matches any class.
    """
    from sst_tpu.core.boxes import points_in_boxes

    b, g = gt_boxes.shape[:2]
    gt_flat = gt_boxes.reshape(b * g, -1)[:, :7]
    gmask = gt_valid.reshape(-1)
    if cls is not None:
        gmask = gmask & (gt_labels.reshape(-1) == cls)
    gt_b = jnp.repeat(jnp.arange(b, dtype=jnp.int32), g)

    n = points_xyz.shape[0]
    pad = (-n) % chunk
    pts = jnp.concatenate([points_xyz[:, :3],
                           jnp.zeros((pad, 3), points_xyz.dtype)])
    pbi = jnp.concatenate([batch_idx, jnp.full((pad,), -1, batch_idx.dtype)])

    def per_chunk(args):
        xyz, bi = args
        inb = points_in_boxes(xyz, gt_flat)  # [chunk, B*G]
        ok = inb & gmask[None, :] & (bi[:, None] == gt_b[None, :])
        return ok.any(axis=1)

    m = jax.lax.map(per_chunk, (pts.reshape(-1, chunk, 3),
                                pbi.reshape(-1, chunk)))
    return m.reshape(-1)[:n] & valid


def iou_neg_piecewise_sample(rng, max_iou, is_pos, valid, num: int,
                             pos_fraction: float,
                             neg_piece_fractions,
                             neg_iou_piece_thrs):
    """Static-shape IoUNegPiecewiseSampler
    (core/bbox/samplers/iou_neg_piecewise_sampler.py): returns a boolean
    keep mask over proposal slots — up to num*pos_fraction random positives
    plus negatives drawn piecewise by IoU band ([thrs[i+1], thrs[i]) for
    piece i, [0, thrs[-1]) for the last), short pieces extending the next.
    """
    from sst_tpu.ops.ccl import topk_compact
    from sst_tpu.ops.segment import INT_SENTINEL, unique_segments

    p = max_iou.shape[0]
    npieces = len(neg_piece_fractions)
    r = jax.random.uniform(rng, (p,))

    pos_exp = int(num * pos_fraction)
    kidx, kok = topk_compact(r, is_pos & valid, pos_exp)
    keep = jnp.zeros((p,), bool).at[jnp.where(kok, kidx, p)].set(
        True, mode="drop")
    neg_exp = jnp.maximum(num - keep.sum(), 0)

    neg = valid & ~is_pos
    thrs = list(neg_iou_piece_thrs) + [0.0]
    piece = jnp.full((p,), npieces, jnp.int32)
    for i in range(npieces):
        lo = thrs[i + 1] if i < npieces - 1 else 0.0
        band = neg & (max_iou >= lo) & (max_iou < thrs[i])
        piece = jnp.where(band, i, piece)

    # random-order rank within each piece: rank over a random permutation
    order = jnp.argsort(r)
    pperm = piece[order]
    uu = unique_segments(jnp.where(pperm < npieces, pperm, INT_SENTINEL),
                         pperm < npieces, npieces)
    ranks = jnp.zeros((p,), jnp.int32).at[order].set(uu.ranks)
    counts = jax.ops.segment_sum(
        jnp.ones((p,), jnp.int32), jnp.where(piece < npieces, piece, npieces),
        num_segments=npieces + 1)[:npieces]

    taken = jnp.zeros((), jnp.int32)
    extend = jnp.zeros((), jnp.int32)
    for i in range(npieces):
        if i == npieces - 1:
            budget = neg_exp - taken
        else:
            budget = jnp.floor(neg_exp * neg_piece_fractions[i]).astype(
                jnp.int32) + extend
        actual = jnp.minimum(counts[i], budget)
        extend = budget - actual
        taken = taken + actual
        keep = keep | ((piece == i) & (ranks < budget))
    return keep


def gt_point_class_labels(points_xyz, batch_idx, valid, gt_boxes, gt_labels,
                          gt_valid, chunk: int = 16384):
    """Per-point class label of the first containing gt box of its sample,
    -1 when inside none (the label-resolved form of gt_fg_points_mask)."""
    from sst_tpu.core.boxes import points_in_boxes

    b, g = gt_boxes.shape[:2]
    gt_flat = gt_boxes.reshape(b * g, -1)[:, :7]
    gl = gt_labels.reshape(-1)
    gmask = gt_valid.reshape(-1)
    gt_b = jnp.repeat(jnp.arange(b, dtype=jnp.int32), g)

    n = points_xyz.shape[0]
    pad = (-n) % chunk
    pts = jnp.concatenate([points_xyz[:, :3],
                           jnp.zeros((pad, 3), points_xyz.dtype)])
    pbi = jnp.concatenate([batch_idx, jnp.full((pad,), -1, batch_idx.dtype)])

    def per_chunk(args):
        xyz, bi = args
        inb = points_in_boxes(xyz, gt_flat)
        ok = inb & gmask[None, :] & (bi[:, None] == gt_b[None, :])
        any_in = ok.any(axis=1)
        first = ok.argmax(axis=1).astype(jnp.int32)
        return jnp.where(any_in, gl[first], -1)

    m = jax.lax.map(per_chunk, (pts.reshape(-1, chunk, 3),
                                pbi.reshape(-1, chunk)))
    return jnp.where(valid, m.reshape(-1)[:n], -1)
