from sst_tpu.models.detectors.dynamic_voxelnet import DynamicVoxelNet, PointBatch
from sst_tpu.models.detectors.pointpillars import PointPillars
