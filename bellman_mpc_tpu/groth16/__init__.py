from .assembly import DensityTracker, KeypairAssembly, ProvingAssignment
from .engine import DUMMY, DummyEngine, Engine, GroupAPI
from .generator import (
    DETERMINISTIC_TRAPDOOR,
    generate_parameters,
    generate_random_parameters,
)
from .prover import (
    DETERMINISTIC_R,
    DETERMINISTIC_S,
    create_proof,
    create_random_proof,
)
from .types import Parameters, PreparedVerifyingKey, Proof, VerifyingKey
from .verifier import prepare_verifying_key, verify_proof

__all__ = [
    "DensityTracker", "KeypairAssembly", "ProvingAssignment",
    "DUMMY", "DummyEngine", "Engine", "GroupAPI",
    "DETERMINISTIC_TRAPDOOR", "generate_parameters", "generate_random_parameters",
    "DETERMINISTIC_R", "DETERMINISTIC_S", "create_proof", "create_random_proof",
    "Parameters", "PreparedVerifyingKey", "Proof", "VerifyingKey",
    "prepare_verifying_key", "verify_proof",
]
