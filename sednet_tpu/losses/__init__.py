from sednet_tpu.losses.embedding import triplet_loss, TripletConfig
from sednet_tpu.losses.edge import (
    edge_cls_loss,
    pull_push_embedding_loss,
    edge_embedding_loss,
)
from sednet_tpu.losses.type_loss import (
    label_smoothing_nll,
    primitive_nll,
    evaluate_type_miou,
)
from sednet_tpu.losses.spline import (
    control_points_permute_loss,
    control_points_permute_closed_loss,
    spline_reconstruction_loss,
    spline_reconstruction_loss_one_sided,
    laplacian_loss,
)
