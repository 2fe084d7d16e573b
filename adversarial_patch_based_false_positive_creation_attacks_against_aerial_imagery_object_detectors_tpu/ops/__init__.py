from .median_pool import (median_pool_2d, median_pool_nhwc,
    median_pool_2d_fast, median_pool_nhwc_fast, median_select)
from .affine import (
    affine_sample, affine_sample_fast, affine_sample_bwd_window,
    affine_source_coords, bilinear_gather,
    rotation_scale_translation_theta, output_grid_coords,
)
from .decode import decode_head, decode_all_heads, head_cell_scores
from .nms import (iou_xywh_matrix, greedy_nms_host, greedy_nms_device,
    greedy_nms_device_batch,
    merge_nms_host)
