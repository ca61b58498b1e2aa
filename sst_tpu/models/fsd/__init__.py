from sst_tpu.models.fsd.single_stage import FSDCaps, SingleStageFSD
from sst_tpu.models.fsd.sir import SIR, SIRLayer
from sst_tpu.models.fsd.sparse_cluster_head import FSDSeparateHead, SparseClusterHeadV2
from sst_tpu.models.fsd.vote_segmentor import VoteSegHead, VoteSegmentor
from sst_tpu.models.fsd.roi_head import (
    FullySparseBboxHead,
    GroupCorrectionHead,
    dynamic_point_pool,
)
from sst_tpu.models.fsd.two_stage import FSD
from sst_tpu.models.fsd.fsdv2 import FSDV2, FSDV2Caps, SingleStageFSDV2
from sst_tpu.models.fsd.fsdpp import TemporalBatch, TwoStageFSDPP
