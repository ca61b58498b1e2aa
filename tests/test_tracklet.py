"""LiDARTracklet container: bin round trip with ids, padding to arrays."""

import numpy as np

from sst_tpu.core.tracklet import LiDARTracklet, pad_tracklet_arrays, tracklets_to_bin


def make_trk(oid="trk-1", n=5):
    rng = np.random.RandomState(hash(oid) % 2**31)
    boxes = np.concatenate(
        [rng.uniform(-5, 5, (n, 3)), rng.uniform(1, 4, (n, 3)),
         rng.uniform(-3, 3, (n, 1))], 1,
    ).astype(np.float32)
    return LiDARTracklet(
        context_name="ctx-a", obj_id=oid, type_id=1,
        timestamps=[1000 + i for i in range(n)],
        boxes=boxes, scores=rng.rand(n).astype(np.float32),
    )


def test_tracklet_bin_roundtrip(tmp_path):
    trks = [make_trk("a", 5), make_trk("b", 3)]
    path = str(tmp_path / "trk.bin")
    tracklets_to_bin(trks, path)
    back = LiDARTracklet.from_waymo_bin(path)
    back.sort(key=lambda t: t.obj_id)
    assert len(back) == 2
    assert back[0].obj_id == "a" and len(back[0]) == 5
    assert back[1].obj_id == "b" and len(back[1]) == 3
    np.testing.assert_allclose(back[0].boxes, trks[0].boxes, atol=1e-5)
    np.testing.assert_allclose(back[0].scores, trks[0].scores, atol=1e-6)


def test_center_frame():
    t = make_trk("c", 7)
    centered, ctr = t.center_frame()
    assert np.allclose(np.median(centered.boxes[:, :3], 0), 0, atol=1e-6)
    np.testing.assert_allclose(centered.boxes[:, :3] + ctr, t.boxes[:, :3],
                               atol=1e-6)


def test_pad_tracklet_arrays():
    rng = np.random.RandomState(0)
    pts = rng.randn(100, 6).astype(np.float32)
    fi = rng.randint(0, 5, 100)
    boxes = rng.randn(5, 7).astype(np.float32)
    out = pad_tracklet_arrays(pts, fi, boxes, np.ones(5, np.float32),
                              boxes, np.ones(5, bool), label=0,
                              max_points=128, max_frames=8)
    assert out["points"].shape == (128, 6)
    assert out["valid"].sum() == 100
    assert out["trk_valid"].sum() == 5
    assert out["gt_valid"].sum() == 5
