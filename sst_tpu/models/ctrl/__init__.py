from sst_tpu.models.ctrl.tracklet_detector import (
    TrackletBatch,
    TrackletDetector,
    TrackletRoIHead,
    TrackletSegmentor,
)
