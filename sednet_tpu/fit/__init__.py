from sednet_tpu.fit.primitives import (
    fit_plane,
    fit_sphere,
    fit_cylinder,
    fit_cone,
    ridge_lstsq,
)
from sednet_tpu.fit.residuals import (
    distance_from_plane,
    distance_from_sphere,
    distance_from_cylinder,
    distance_from_cone,
    distance_from_torus,
    residual_loss,
)
from sednet_tpu.fit.samplers import (
    sample_plane,
    sample_sphere,
    sample_cylinder,
    sample_cone,
    sample_torus,
)
