from .warp import tent_warp_pallas, pallas_available

__all__ = ["tent_warp_pallas", "pallas_available"]
