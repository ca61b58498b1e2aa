from sst_tpu.models.detectors.dynamic_voxelnet import DynamicVoxelNet, PointBatch
from sst_tpu.models.detectors.pointpillars import PointPillars  # noqa: F401 (registers)
from sst_tpu.models.fsd import (
    FSD,
    FSDV2,
    SingleStageFSD,
    SingleStageFSDV2,
    TwoStageFSDPP,
    VoteSegmentor,
)
from sst_tpu.models.ctrl import (
    TrackletBatch,
    TrackletDetector,
    TrackletRoIHead,
    TrackletSegmentor,
)
from sst_tpu.models.heads.anchor3d import Anchor3DHead
from sst_tpu.models.heads.center_head import CenterHead
from sst_tpu.models.middle_encoders import PointPillarsScatter, SparseEncoder
from sst_tpu.models.pointnet_modules import (PAConv, PointFPModule,
                                             PointSAModule, PointSAModuleMSG,
                                             ScoreNet)
from sst_tpu.models.second import SECOND, SECONDFPN
from sst_tpu.models.sst import SSTv1, SSTv2
from sst_tpu.models.sst_input import SSTPlan, sst_input_layer
from sst_tpu.models.vfe import (DynamicPillarFeatureNet, DynamicVFE,
                                HardSimpleVFE, PillarFeatureNet)
from sst_tpu.utils.registry import MODELS

for _cls in (DynamicVoxelNet, Anchor3DHead, CenterHead, SECOND, SECONDFPN,
             SSTv1, SSTv2, DynamicVFE, HardSimpleVFE, PillarFeatureNet,
             DynamicPillarFeatureNet, PointPillarsScatter, SparseEncoder, FSD, FSDV2,
             SingleStageFSD, SingleStageFSDV2, TwoStageFSDPP, VoteSegmentor,
             TrackletDetector, TrackletSegmentor, TrackletRoIHead):
    MODELS.register(_cls)
