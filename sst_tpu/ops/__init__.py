from sst_tpu.ops.segment import (
    UniqueResult,
    gather_segments,
    scatter_v2,
    segment_max_with_argmax,
    segment_reduce,
    unique_segments,
)
from sst_tpu.ops.voxelize import (
    VoxelMapping,
    compute_voxel_coords,
    delinearize_key,
    dynamic_voxelize,
    grid_shape_zyx,
    linearize_coords,
)
from sst_tpu.ops.window import (
    BucketSpec,
    FlatToWindow,
    build_flat2win,
    drop_and_bucket,
    flat2window,
    get_window_coors,
    window2flat,
    window_key_padding,
)
