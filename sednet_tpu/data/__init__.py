from sednet_tpu.data.geometry import (
    normalize_points,
    pca_align,
    rotation_matrix_a_to_b,
)
from sednet_tpu.data.augment import Augmentor
from sednet_tpu.data.labels import (
    canonicalize_instance_labels,
    remap_type_labels_train,
    remap_type_labels_eval,
)
from sednet_tpu.data.datasets import (
    ParseNetDataset,
    EdgeDataset,
    MixedDataset,
    BatchLoader,
    PrefetchLoader,
)
from sednet_tpu.data.synthetic import (
    make_synthetic_shape,
    write_parsenet_h5,
    write_edge_h5,
)
