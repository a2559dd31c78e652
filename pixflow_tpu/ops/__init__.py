from .resample import (
    grid_sample,
    grid_sample_mxu,
    grid_sample_auto,
    grid_sample_nearest,
    resize_align_corners,
    upflow8,
    coords_grid,
    normalize_coords,
    normalize_flow,
    denormalize_flow,
)
from .flow import (
    concat_flow,
    all_concat_flow,
    forward_backward_consistency,
    compose_and_mask,
    mask_ratio,
)
from .loss import (
    bin_centers,
    warp_points_with_flow,
    pixpro_pair_loss,
    instance_loss,
    ppm_attention,
)

__all__ = [
    "grid_sample", "grid_sample_mxu", "grid_sample_auto", "grid_sample_nearest", "resize_align_corners", "upflow8",
    "coords_grid", "normalize_coords", "normalize_flow", "denormalize_flow",
    "concat_flow", "all_concat_flow", "forward_backward_consistency",
    "compose_and_mask", "mask_ratio",
    "bin_centers", "warp_points_with_flow", "pixpro_pair_loss",
    "instance_loss", "ppm_attention",
]
