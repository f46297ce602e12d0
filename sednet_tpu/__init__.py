"""SED-Net TPU: a TPU-native point-cloud primitive segmentation & fitting framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of SED-Net
("Surface and Edge Detection for Primitive Fitting of Point Clouds",
SIGGRAPH 2023). The pipeline takes a 10k-point CAD-like point cloud and
produces per-point primitive-type labels, instance segmentation via
mean-shift on a learned embedding, edge classification, fitted primitive
parameters (plane/sphere/cylinder/cone/B-spline), analytic edges/corners,
and trimmed meshes.

Design stance (TPU-first):
  * pure-functional core: model / losses / clustering / fits are jit-able
    functions over pytrees; static shapes everywhere (N points, max 50
    clusters, 6 types) with masks instead of data-dependent shapes.
  * blocked streaming kernels (XLA + Pallas) for the O(N^2) hot spots:
    kNN graph build, mean-shift kernel iteration, chamfer distance,
    normal-affinity products.
  * batch data-parallelism via jax.sharding.Mesh + jit, collectives over
    ICI; per-shape inference pipeline is vmap/shard-able.
"""

__version__ = "0.1.0"
