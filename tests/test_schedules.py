"""Hook-equivalent schedule tests (fsd_hooks.py parity)."""

from sst_tpu.train.schedules import DisableAugmentationSchedule, FSDDetectionSchedule


def test_fsd_detection_schedule_phases():
    s = FSDDetectionSchedule(enable_after=100, buffer_start=0.3,
                             delay_buffer_until=200, quantize=0.05)
    assert s(0) == dict(pretrain=True, thr_extra=0.0)
    assert s(99)["pretrain"] is True
    mid = s(150)
    assert mid["pretrain"] is False
    assert 0.1 <= mid["thr_extra"] <= 0.2
    assert s(200) == dict(pretrain=False, thr_extra=0.0)
    assert s(10_000)["thr_extra"] == 0.0
    # quantization keeps the set of distinct values small (jit variants)
    vals = {s(t)["thr_extra"] for t in range(100, 200)}
    assert len(vals) <= 8


def test_disable_aug_schedule():
    pipeline = [
        dict(type="ObjectSample", db_sampler={}),
        dict(type="RandomFlip3D"),
        dict(type="GlobalRotScaleTrans"),
        dict(type="PointsRangeFilter", point_cloud_range=[0] * 6),
        dict(type="PadToCap", max_points=16),
    ]
    s = DisableAugmentationSchedule(disable_after_step=500)
    assert len(s.filter_pipeline(pipeline, 0)) == 5
    late = s.filter_pipeline(pipeline, 500)
    assert [c["type"] for c in late] == ["PointsRangeFilter", "PadToCap"]
    assert s.boundary_crossed(499, 500)
    assert not s.boundary_crossed(500, 501)
    assert not s.boundary_crossed(100, 200)
