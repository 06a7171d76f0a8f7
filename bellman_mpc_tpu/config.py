"""Typed runtime configuration.

The reference's knobs are Cargo features (`groth16`, `multicore` —
bellman/Cargo.toml:39-42), the RAYON_NUM_THREADS env var and a toolchain
pin; the TPU framework's knobs live here, overridable by environment:

  BMT_NUM_THREADS      host worker threads (parallel/worker.py)
  BMT_MSM_STRATEGY     "auto" | "ladder" | "table" | "rns" | "pippenger" |
                       "flatpip" (auto = rns on TPU, ladder on CPU; "rns"
                       folds the MSM windows over the RNS/MXU field engine,
                       see DESIGN-NOTES.md "Measured TPU performance model")
  BMT_PIPPENGER_C      window bits for Pippenger buckets (default 8)
  BMT_TABLE_C          window bits for the gather-table MSM (default 4)
  BMT_MESH_SHAPE       "data,model" extents for make_mesh, e.g. "4,2"
  BMT_DETERMINISTIC    "1" (default) keeps the fork's fixed trapdoor/blinding
  BMT_TEST_TPU         run the test-suite on the real chip
  BMT_BENCH_B          bench.py proof-batch size (default 16)
  BMT_CARRIES          "scan" | "flat" carry-strategy override (fields/limb)
  BMT_FIXED_BASE       "comb" opts into comb-table fixed-base multiplication
  BMT_STACK_MSMS       "1" stacks the prove-step G1 MSMs into one vmap body
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass
class Config:
    num_threads: Optional[int] = None
    msm_strategy: str = "auto"
    pippenger_c: int = 8
    mesh_shape: Optional[Tuple[int, int]] = None
    deterministic: bool = True

    @staticmethod
    def from_env() -> "Config":
        mesh = os.environ.get("BMT_MESH_SHAPE")
        return Config(
            num_threads=(
                int(os.environ["BMT_NUM_THREADS"])
                if "BMT_NUM_THREADS" in os.environ
                else None
            ),
            msm_strategy=os.environ.get("BMT_MSM_STRATEGY", "auto"),
            pippenger_c=int(os.environ.get("BMT_PIPPENGER_C", "8")),
            mesh_shape=(
                tuple(int(x) for x in mesh.split(",")) if mesh else None
            ),
            deterministic=os.environ.get("BMT_DETERMINISTIC", "1") == "1",
        )


_config: Optional[Config] = None


def get_config() -> Config:
    global _config
    if _config is None:
        _config = Config.from_env()
    return _config
