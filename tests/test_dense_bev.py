"""Dense-BEV TPU-native backbone: parity-of-interface with the sparse path.

The dense segmentor/mixer (sst_tpu/models/dense_bev.py) replaces the
reference's spconv UNets (sparse_unet.py:324/417) on the flagship fast path;
these tests pin the contract: same per-point outputs, trainable end to end,
and BEVScatter/DenseVoxelDecode round-trip invariants.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sst_tpu.flagship import tiny_batch, tiny_fsdv2_dense
from sst_tpu.models.dense_bev import BEVScatter, DenseBEVUNet, DenseVoxelDecode


def test_bev_scatter_places_features_at_cells():
    m = BEVScatter(nz=4)
    feats = jnp.ones((3, 8))
    coords = jnp.array([[0, 1, 2, 3], [0, 2, 2, 3], [1, 0, 0, 0]], jnp.int32)
    valid = jnp.array([True, True, False])
    v = m.init(jax.random.PRNGKey(0), feats, coords, valid, 2, (4, 4))
    canvas = m.apply(v, feats, coords, valid, 2, (4, 4))
    assert canvas.shape == (2, 4, 4, 9)
    # occupancy channel marks exactly the one scattered cell (two voxels share
    # the same xy column in batch 0)
    occ = np.asarray(canvas[..., -1])
    assert occ[0, 2, 3] == 1.0 and occ.sum() == 1.0
    # invalid voxel contributed nothing
    assert np.asarray(canvas[1]).sum() == 0.0


def test_bev_scatter_z_groups_separate_bands():
    """z_groups=G scatters each z band into its own channel slice: ground
    and pedestrian in the same xy column stay in separate channels instead
    of max-merging (the legacy collapse's measured pedestrian-mAP cost,
    AB_DENSE_SPARSE_r03.json)."""
    m = BEVScatter(nz=4, z_groups=2)
    feats = jnp.ones((2, 8))
    # same xy cell, z=1 (band 0) and z=3 (band 1)
    coords = jnp.array([[0, 1, 2, 3], [0, 3, 2, 3]], jnp.int32)
    valid = jnp.ones((2,), bool)
    v = m.init(jax.random.PRNGKey(0), feats, coords, valid, 1, (4, 4))
    canvas = np.asarray(m.apply(v, feats, coords, valid, 1, (4, 4)))
    # per-band layout: [feats(8), occ] x 2 bands (occ fused into the same
    # scatter to avoid a full-canvas concat copy)
    assert canvas.shape == (1, 4, 4, 2 * 9)
    occ = canvas[0, :, :, 8::9]
    assert occ[2, 3, 0] == 1.0 and occ[2, 3, 1] == 1.0 and occ.sum() == 2.0
    band0, band1 = canvas[0, 2, 3, :8], canvas[0, 2, 3, 9:17]
    assert band0.sum() > 0 and band1.sum() > 0
    # bands carry different z embeddings, not a shared max-merge
    assert not np.allclose(band0, band1)
    # a band with no voxel stays empty elsewhere
    assert canvas[0, :2, :, :].sum() == 0.0


def test_dense_voxel_decode_z_groups_reads_own_band():
    """Grouped decode gathers the voxel's OWN band slice from the UNet
    output (G*group_channels channels)."""
    cz = 4
    m = DenseVoxelDecode(nz=4, out_channels=8, z_groups=2, group_channels=cz)
    bev = jnp.concatenate(
        [jnp.full((1, 4, 4, cz), 1.0), jnp.full((1, 4, 4, cz), 5.0)], -1)
    coords = jnp.array([[0, 0, 1, 1], [0, 3, 1, 1]], jnp.int32)
    valid = jnp.ones((2,), bool)
    v = m.init(jax.random.PRNGKey(0), bev, coords, valid, False)
    out = m.apply(v, bev, coords, valid, False)
    assert out.shape == (2, 8)
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))


def test_dense_unet_shapes_and_decoder_maps():
    m = DenseBEVUNet(encoder_channels=((8, 8), (16, 16), (16, 16)),
                     decoder_channels=(16, 8), out_channels=8)
    x = jnp.ones((2, 16, 16, 4))
    v = m.init(jax.random.PRNGKey(0), x, False)
    out, maps = m.apply(v, x, False)
    assert out.shape == (2, 16, 16, 8)
    assert maps[0].shape == (2, 8, 8, 16)  # deepest decoder map first
    assert maps[1].shape == (2, 16, 16, 8)


def test_dense_voxel_decode_z_distinguishes():
    m = DenseVoxelDecode(nz=4, out_channels=8)
    bev = jnp.ones((1, 4, 4, 6))
    # two voxels, same xy cell, different z
    coords = jnp.array([[0, 0, 1, 1], [0, 3, 1, 1]], jnp.int32)
    valid = jnp.ones((2,), bool)
    v = m.init(jax.random.PRNGKey(0), bev, coords, valid, False)
    out = m.apply(v, bev, coords, valid, False)
    assert out.shape == (2, 8)
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))


@pytest.fixture(scope="module")
def dense_model():
    model = tiny_fsdv2_dense()
    batch = tiny_batch(batch_size=2, num_points=256)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    return model, batch, variables


def test_dense_fsdv2_loss_finite_and_grads_flow(dense_model):
    model, batch, variables = dense_model

    def loss_fn(params):
        losses, _ = model.apply(
            {**variables, "params": params}, batch, train=True,
            method=model.loss, mutable=["batch_stats"],
        )
        return sum(v for k, v in losses.items()
                   if k.startswith("loss")), losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(total))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    # gradients reach both the dense UNet and the dense mixer
    leaves = jax.tree_util.tree_leaves_with_path(grads)
    seg_g = [np.abs(np.asarray(v)).sum() for p, v in leaves
             if "unet_mod" in jax.tree_util.keystr(p)]
    mix_g = [np.abs(np.asarray(v)).sum() for p, v in leaves
             if "mixer_mod" in jax.tree_util.keystr(p)]
    assert sum(seg_g) > 0 and sum(mix_g) > 0


def test_dense_fsdv2_predict(dense_model):
    model, batch, variables = dense_model
    out = model.apply(variables, batch, method=model.predict)
    assert out["boxes"].shape[0] == 2
    assert np.isfinite(np.asarray(out["boxes"])).all()
