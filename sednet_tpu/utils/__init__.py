from sednet_tpu.utils.vis import (
    COLORS_TYPE,
    instance_palette,
    visual_labels,
    save_xyz,
)
