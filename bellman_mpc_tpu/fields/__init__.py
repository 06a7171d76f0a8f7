from .host import PrimeField, batch_inv
from .limb import LimbField, LIMB_BITS, LIMB_MASK

__all__ = ["PrimeField", "batch_inv", "LimbField", "LIMB_BITS", "LIMB_MASK"]
