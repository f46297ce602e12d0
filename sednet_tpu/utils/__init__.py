from sednet_tpu.utils.vis import (
    COLORS_TYPE,
    instance_palette,
    visual_labels,
    save_xyz,
)
from sednet_tpu.utils.grid_vis import (
    render_meshes_grid,
    render_pointclouds_grid,
    save_images_rotations,
    vis_batch_in_grid,
)
