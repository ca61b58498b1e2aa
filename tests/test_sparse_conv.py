"""Sparse conv engine tests: submanifold conv is validated against a dense
3D convolution restricted to active sites (the defining property of
submanifold convolution), strided conv site-generation against spconv
semantics, inverse conv against site-set restoration."""

import jax
import jax.numpy as jnp
import numpy as np

from sst_tpu.models.sparse_unet import SimpleSparseUNet, build_unet_plan
from sst_tpu.ops.sparse_conv import (
    build_canvas,
    downsample_grid,
    gather_gemm,
    inverse_neighbor_table,
    make_sparse_grid,
    strided_neighbor_table,
    subm_neighbor_table,
)

GRID = (4, 8, 8)  # (nz, ny, nx)


def random_grid(rng, n=50, cap=64, batch=2):
    coords = np.stack(
        [
            rng.randint(0, batch, n),
            rng.randint(0, GRID[0], n),
            rng.randint(0, GRID[1], n),
            rng.randint(0, GRID[2], n),
        ],
        -1,
    ).astype(np.int32)
    # dedupe
    coords = np.unique(coords, axis=0)
    n = len(coords)
    pad = cap - n
    coords = np.concatenate([coords, -np.ones((pad, 4), np.int32)])
    valid = np.zeros(cap, bool)
    valid[:n] = True
    sg, order = make_sparse_grid(
        jnp.asarray(coords), jnp.asarray(valid), GRID, batch
    )
    return sg


def test_subm_conv_matches_dense(rng):
    sg = random_grid(rng)
    cin, cout = 3, 5
    v = sg.cap
    feats = rng.randn(v, cin).astype(np.float32)
    feats[~np.asarray(sg.valid)] = 0
    w = rng.randn(27, cin, cout).astype(np.float32)

    canvas = build_canvas(sg)
    nbr = subm_neighbor_table(sg, canvas)
    out = np.asarray(gather_gemm(jnp.asarray(feats), nbr, jnp.asarray(w)))

    # dense reference: scatter to canvas, correlate, read at active sites
    nz, ny, nx = GRID
    dense = np.zeros((2, nz, ny, nx, cin), np.float32)
    coords = np.asarray(sg.coords)
    val = np.asarray(sg.valid)
    for i in np.where(val)[0]:
        b, z, y, x = coords[i]
        dense[b, z, y, x] = feats[i]
    offs = [
        (dz, dy, dx)
        for dz in (-1, 0, 1)
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
    ]
    for i in np.where(val)[0]:
        b, z, y, x = coords[i]
        ref = np.zeros(cout, np.float32)
        for k, (dz, dy, dx) in enumerate(offs):
            zz, yy, xx = z + dz, y + dy, x + dx
            if 0 <= zz < nz and 0 <= yy < ny and 0 <= xx < nx:
                ref += dense[b, zz, yy, xx] @ w[k]
        np.testing.assert_allclose(out[i], ref, rtol=1e-4, atol=1e-4)


def test_downsample_sites_spconv_semantics(rng):
    sg = random_grid(rng)
    out = downsample_grid(sg, cap_out=64, stride=(2, 2, 2), padding=(1, 1, 1))
    # brute force: output site exists iff some input in its receptive field
    nz, ny, nx = GRID
    oz, oy, ox = out.grid
    assert (oz, oy, ox) == ((4 + 2 - 3) // 2 + 1, (8 + 2 - 3) // 2 + 1, (8 + 2 - 3) // 2 + 1)
    coords = np.asarray(sg.coords)[np.asarray(sg.valid)]
    active = {tuple(c) for c in coords}
    expect = set()
    for b, z, y, x in active:
        for ozz in range(oz):
            for oyy in range(oy):
                for oxx in range(ox):
                    z0, y0, x0 = ozz * 2 - 1, oyy * 2 - 1, oxx * 2 - 1
                    if z0 <= z < z0 + 3 and y0 <= y < y0 + 3 and x0 <= x < x0 + 3:
                        expect.add((b, ozz, oyy, oxx))
    got = {tuple(c) for c in np.asarray(out.coords)[np.asarray(out.valid)]}
    assert got == expect


def test_strided_and_inverse_tables(rng):
    sg = random_grid(rng)
    out = downsample_grid(sg, cap_out=64)
    in_canvas = build_canvas(sg)
    out_canvas = build_canvas(out)
    dn = strided_neighbor_table(out, sg, in_canvas)
    inv = inverse_neighbor_table(sg, out, out_canvas)
    dn, inv = np.asarray(dn), np.asarray(inv)
    # consistency: (o, k, i) in down table <=> (i, k', o) in inverse with
    # mirrored offset k' = 26 - k (i = o*s - p + off_k  <=>  o = (i + p - off_k)/s)
    pairs_down = set()
    for k in range(27):
        for o in range(out.cap):
            i = dn[k, o]
            if i < sg.cap:
                pairs_down.add((o, k, i))
    pairs_inv = set()
    for k in range(27):
        for i in range(sg.cap):
            o = inv[k, i]
            if o < out.cap:
                pairs_inv.add((o, k, i))
    assert pairs_down == pairs_inv
    assert len(pairs_down) > 0


def test_unet_forward_shapes(rng):
    sg = random_grid(rng, n=60, cap=64)
    caps = (64, 48, 32, 16)
    plan = build_unet_plan(
        sg, caps, strides=[(2, 2, 2)] * 3, paddings=[(1, 1, 1)] * 3
    )
    assert plan.levels[1].grid == (2, 4, 4)
    model = SimpleSparseUNet(
        in_channels=4, base_channels=8,
        encoder_channels=((8,), (8, 8), (16, 16), (16, 16)),
        decoder_channels=((16, 16, 16), (16, 16, 8), (8, 8, 8), (8, 8, 8)),
    )
    feats = jnp.asarray(rng.randn(64, 4).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), feats, plan, train=False)
    out = model.apply(variables, feats, plan, train=False)
    assert out["voxel_feats"].shape == (64, 8)
    assert np.isfinite(np.asarray(out["voxel_feats"])).all()
    # padding rows stay zero
    inval = ~np.asarray(sg.valid)
    assert np.abs(np.asarray(out["voxel_feats"])[inval]).max() == 0


def test_unet_remat_grad_equivalence():
    """remat=True must change memory behavior only: identical outputs and
    gradients to the plain build (flagship sparse trains with remat)."""
    import jax

    from sst_tpu.models.fsd.vote_segmentor import build_unet_plan
    from sst_tpu.models.sparse_unet import SimpleSparseUNet
    from sst_tpu.ops.sparse_conv import SparseGrid

    rng = np.random.RandomState(0)
    n = 64
    coords = np.unique(
        np.concatenate([np.zeros((n, 1), np.int64),
                        rng.randint(0, 8, (n, 3))], 1), axis=0)
    v = len(coords)
    pad = np.zeros((96 - v, 4), np.int64)
    coords = jnp.asarray(np.concatenate([coords, pad]))
    valid = jnp.asarray(np.arange(96) < v)
    key = jnp.where(valid, (coords[:, 0] * 8 + coords[:, 1]) * 64
                    + coords[:, 2] * 8 + coords[:, 3],
                    jnp.iinfo(jnp.int32).max)
    sg = SparseGrid(keys=key.astype(jnp.int32), coords=coords.astype(jnp.int32),
                    valid=valid, grid=(8, 8, 8), batch_size=1)
    plan = build_unet_plan(sg, (96, 64, 32), ((2, 2, 2),) * 2,
                           ((1, 1, 1),) * 2)
    feats = jnp.asarray(rng.randn(96, 8).astype(np.float32))
    kw = dict(base_channels=8, encoder_channels=((8,), (8, 8), (16, 16)),
              decoder_channels=((16, 16, 8), (8, 8, 8), (8, 8, 8)))
    plain = SimpleSparseUNet(remat=False, **kw)
    rem = SimpleSparseUNet(remat=True, **kw)
    variables = plain.init(jax.random.PRNGKey(0), feats, plan, False)

    def loss(m, params):
        out, _ = m.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            feats, plan, True, mutable=["batch_stats"])
        return jnp.sum(out["voxel_feats"] ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(plain, p))(variables["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss(rem, p))(variables["params"])
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
