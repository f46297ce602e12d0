from sednet_tpu.cluster.mean_shift import (
    MeanShiftResult,
    compute_bandwidth,
    mean_shift_iterate,
    mean_shift,
    guard_mean_shift,
    cluster_batch,
    nms,
)
from sednet_tpu.cluster.spectral import hpnet_process, normal_affinity_topk
