from sst_tpu.data.datasets import (
    Custom3DDataset,
    SyntheticDataset,
    WaymoDataset,
    collate_to_batch,
)
from sst_tpu.data.loader import DataLoader
from sst_tpu.data import pipelines  # noqa: F401 (registers transforms)
