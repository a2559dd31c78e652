from .warp import tent_warp_pallas, grid_sample_pallas, pallas_available
from .pair_loss import pixpro_pair_loss_fused, fused_pair_sums

__all__ = ["tent_warp_pallas", "grid_sample_pallas", "pallas_available",
           "pixpro_pair_loss_fused", "fused_pair_sums"]
