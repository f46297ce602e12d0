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
