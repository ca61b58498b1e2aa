from sst_tpu.models.heads.anchor3d import Anchor3DHead
