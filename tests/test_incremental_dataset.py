"""IncrementalWaymoDataset: sequential frame assembly + seed alignment +
TemporalBatch collation feeding TwoStageFSDPP."""

import pickle

import numpy as np
import pytest


@pytest.fixture
def seq_data(tmp_path):
    rng = np.random.RandomState(0)
    infos = []
    seeds = {}
    # two sequences x 4 frames, ego moving +1m in x per frame
    for seq in range(2):
        for fr in range(4):
            sid = seq * 1000 + fr
            pts = rng.uniform(-6, 6, (400, 6)).astype(np.float32)
            pts[:, 2] = rng.uniform(-1, 2, 400)
            rel = f"velo_{sid}.bin"
            pts.tofile(tmp_path / rel)
            pose = np.eye(4)
            pose[0, 3] = fr * 1.0 + seq * 100.0
            infos.append(dict(
                point_cloud=dict(velodyne_path=rel),
                image=dict(image_idx=sid),
                pose=pose,
                annos=dict(
                    name=np.array(["Car"]),
                    location=np.array([[1.0, 2.0, -0.5]], np.float32),
                    dimensions=np.array([[4.5, 1.6, 2.0]], np.float32),
                    rotation_y=np.array([0.1], np.float32),
                ),
            ))
            seeds[f"{sid:07d}"] = dict(
                boxes=np.array([[2.0, 1.0, -0.5, 2, 4.5, 1.6, 0.2]],
                               np.float32),
                labels=np.array([0], np.int32),
                scores=np.array([0.9], np.float32),
            )
    with open(tmp_path / "infos.pkl", "wb") as f:
        pickle.dump(infos, f)
    with open(tmp_path / "seeds.pkl", "wb") as f:
        pickle.dump(seeds, f)
    return tmp_path


def test_incremental_dataset(seq_data):
    from sst_tpu.data.incremental_dataset import (
        IncrementalWaymoDataset,
        collate_temporal,
    )

    ds = IncrementalWaymoDataset(
        data_root=str(seq_data), info_path=str(seq_data / "infos.pkl"),
        seeds_path=str(seq_data / "seeds.pkl"),
        num_previous_frames=2, max_points=2048, max_seeds=8, max_gt=8,
        load_dim=6, use_dim=(0, 1, 2, 3, 4),
    )
    s = ds[2]  # frame 2 of sequence 0: two previous frames available
    fi = s["frame_inds"][s["valid"]]
    assert set(np.unique(fi)) == {0, 1, 2}
    assert s["seed_valid"].sum() == 2  # seeds from frames 1 and 0
    # seed from frame 1 (ego at x=1) seen from frame 2 (ego at x=2): x -= 1
    sb = s["seed_boxes"][s["seed_valid"]]
    assert np.min(np.abs(sb[:, 0] - 1.0)) < 1e-5
    # sequence boundary: frame 0 of sequence 1 has no previous frames
    s2 = ds[4]
    assert set(np.unique(s2["frame_inds"][s2["valid"]])) == {0}
    assert s2["seed_valid"].sum() == 0

    batch = collate_temporal([s, ds[3]])
    assert batch.points.shape == (2, 2048, 5)

    # feeds the FSD++ model end to end
    import jax

    from tests.test_fsdpp import tiny_fsdpp

    model = tiny_fsdpp()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "seeds": jax.random.PRNGKey(1)},
        batch, train=False,
    )
    out, _ = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        batch, train=True, method=model.loss,
        rngs={"seeds": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
    )
    total = sum(float(v) for k, v in out.items() if k.startswith("loss"))
    assert np.isfinite(total), {k: float(v) for k, v in out.items()}


def test_sequential_eval_seed_feedback(seq_data):
    """Frame t's detections must appear (pose-transformed) as frame t+1's
    seeds — the reuse_simple_test loop (two_stage_fsdpp.py:357-403)."""
    import jax
    import numpy as np

    from sst_tpu.data.incremental_dataset import (
        IncrementalWaymoDataset,
        run_sequential_eval,
    )

    ds = IncrementalWaymoDataset(
        data_root=str(seq_data), info_path=str(seq_data / "infos.pkl"),
        num_previous_frames=2, max_points=2048, max_seeds=8, max_gt=8,
        load_dim=6, use_dim=(0, 1, 2, 3, 4), test_mode=True,
    )

    seen_seeds = []

    def fake_predict(batch):
        # record the seeds this frame received, then "detect" one box at the
        # ego origin with score 0.9
        seen_seeds.append(
            (np.asarray(batch.seed_boxes[0]).copy(),
             np.asarray(batch.seed_valid[0]).copy())
        )
        b = np.zeros((1, 4, 7), np.float32)
        b[0, 0] = [3.0, 0.0, -0.5, 2, 4, 1.5, 0.3]
        return dict(
            boxes=b, scores=np.array([[0.9, 0, 0, 0]], np.float32),
            labels=np.zeros((1, 4), np.int32),
            valid=np.array([[True, False, False, False]]),
        )

    results = run_sequential_eval(ds, fake_predict, score_thr=0.5)
    assert len(results) == len(ds)
    # frame 0 of each sequence: no seeds
    assert not seen_seeds[0][1].any()
    assert not seen_seeds[4][1].any()
    # frame 1 of sequence 0: exactly the frame-0 detection, shifted by the
    # ego motion (+1 m in x per frame → box x 3.0 becomes 2.0)
    boxes1, valid1 = seen_seeds[1]
    assert valid1.sum() == 1
    np.testing.assert_allclose(boxes1[0], [2.0, 0.0, -0.5, 2, 4, 1.5, 0.3],
                               atol=1e-5)
