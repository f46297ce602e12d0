from sednet_tpu.ops.knn import (
    knn_indices,
    knn_indices_points_normals,
    pairwise_sqdist,
)
from sednet_tpu.ops.graph import (
    gather_neighbors,
    edge_features,
    edge_features_cross,
    edge_conv_features,
)
from sednet_tpu.ops.flash_topk import (
    pallas_topk_supported,
    topk_neighbors_pallas,
    topk_pallas,
)
from sednet_tpu.ops.chamfer import chamfer_distance, chamfer_index, nn_distance
from sednet_tpu.ops.guard import guard_exp, guard_sqrt
