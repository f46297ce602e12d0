from sednet_tpu.metrics.segmentation import (
    to_one_hot,
    relaxed_iou_fast,
    hungarian_match,
    primitive_type_per_segment,
    siou_matched_segments,
    siou_matched_segments_usecd,
    siou_matched_segments_usecd_batch,
    compute_type_miou_abc,
    mean_iou_one_sample,
)
