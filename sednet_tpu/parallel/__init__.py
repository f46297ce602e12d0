from sednet_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    data_sharding,
    replicated_sharding,
)
from sednet_tpu.parallel.intra_shape import (
    ring_knn,
    mean_shift_iterate_sharded,
)
from sednet_tpu.parallel.big_forward import (
    big_sednet_forward,
    big_cloud_segment,
)
