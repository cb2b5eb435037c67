from flashvtg_tpu.ops.span import (
    span_xx_to_cxw,
    span_cxw_to_xx,
    temporal_iou,
    temporal_iou_and_union,
    temporal_intersection_over_pred,
    generalized_temporal_iou,
)
from flashvtg_tpu.ops.nms import temporal_nms_scores, suppress_overlaps
from flashvtg_tpu.ops.pad import pad_to_length, pad_batch, bucket_length
from flashvtg_tpu.ops.windows import (
    clip_ids_to_windows,
    windows_to_clip_ids,
    clip_window_to_seconds,
)
