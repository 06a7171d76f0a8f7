"""Demo circuits / app layer (reference: mimc_mod.rs, and_mod.rs, range_mod.rs)."""

from .and_range import AndDemo, RangeDemo, RangeDemoExplicit
from .mimc import MIMC_ROUNDS, MiMCDemo, mimc, mimc_constants, neo_create_parameters

__all__ = [
    "AndDemo", "RangeDemo", "RangeDemoExplicit", "MIMC_ROUNDS", "MiMCDemo", "mimc",
    "mimc_constants", "neo_create_parameters",
]
