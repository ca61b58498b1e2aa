from sst_tpu.data.datasets import (
    Argo2Dataset,
    CBGSDataset,
    Custom3DDataset,
    KittiDataset,
    NuScenesDataset,
    SyntheticDataset,
    WaymoDataset,
    collate_to_batch,
)
from sst_tpu.data.dbsampler import DataBaseSampler, ObjectSample
from sst_tpu.data.incremental_dataset import IncrementalWaymoDataset, collate_temporal
from sst_tpu.data.loader import DataLoader, sequential_lane_indices, weak_shuffle_indices
from sst_tpu.data.tracklet_dataset import WaymoTrackletDataset, collate_tracklets
from sst_tpu.data import pipelines  # noqa: F401 (registers transforms)
