from sst_tpu.models.detectors.dynamic_voxelnet import DynamicVoxelNet, PointBatch
