from .mesh import make_mesh
from .batch_prover import BatchProver

__all__ = ["make_mesh", "BatchProver"]
