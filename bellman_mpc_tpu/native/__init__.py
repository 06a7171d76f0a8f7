"""Native host runtime: C-ABI kernels loaded via ctypes.

Builds bmt_native.c on first use (cc -O3 -shared) and exposes `lc_eval_abc`,
the sparse linear-combination evaluator used by the compiled-circuit prover
path (groth16/compiled.py).  Falls back to pure Python transparently when no
C toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

_DIR = Path(__file__).parent
_SO = _DIR / "libbmt_native.so"
_SRC = _DIR / "bmt_native.c"

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["cc", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_SO)],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(_SO))
        lib.lc_eval.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_uint32,
        ]
        lib.lc_eval.restype = None
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _vals_to_limbs(vals: List[int]) -> np.ndarray:
    out = np.empty((len(vals), 4), dtype=np.uint64)
    for i, v in enumerate(vals):
        out[i, 0] = v & 0xFFFFFFFFFFFFFFFF
        out[i, 1] = (v >> 64) & 0xFFFFFFFFFFFFFFFF
        out[i, 2] = (v >> 128) & 0xFFFFFFFFFFFFFFFF
        out[i, 3] = (v >> 192) & 0xFFFFFFFFFFFFFFFF
    return out


class PackedLcTable:
    """Per-constraint sparse LC terms packed for the native evaluator."""

    def __init__(self, per_constraint_terms: List[List[Tuple[int, int, int]]]):
        # term = (kind, index, coeff) with kind 0=input, 1=aux
        n_terms = sum(len(t) for t in per_constraint_terms)
        self.n_cons = len(per_constraint_terms)
        self.offsets = np.zeros(self.n_cons + 1, dtype=np.uint32)
        self.kinds = np.zeros(n_terms, dtype=np.uint8)
        self.indices = np.zeros(n_terms, dtype=np.uint32)
        coeffs: List[int] = []
        k = 0
        for c, terms in enumerate(per_constraint_terms):
            self.offsets[c] = k
            for kind, idx, coeff in terms:
                self.kinds[k] = kind
                self.indices[k] = idx
                coeffs.append(coeff)
                k += 1
        self.offsets[self.n_cons] = k
        self.coeffs = _vals_to_limbs(coeffs)


def lc_eval(
    table: PackedLcTable,
    inputs: List[int],
    aux: List[int],
    modulus: int,
) -> List[int]:
    """Evaluate all constraints' LCs; returns values mod `modulus`."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    in_arr = _vals_to_limbs(inputs)
    aux_arr = _vals_to_limbs(aux) if aux else np.zeros((1, 4), np.uint64)
    out = np.zeros((table.n_cons, 9), dtype=np.uint64)
    lib.lc_eval(
        in_arr.ctypes.data, aux_arr.ctypes.data,
        table.offsets.ctypes.data, table.kinds.ctypes.data,
        table.indices.ctypes.data, table.coeffs.ctypes.data,
        out.ctypes.data, table.n_cons,
    )
    raw = out.tobytes()  # 72 bytes per constraint, little-endian
    return [
        int.from_bytes(raw[i * 72 : (i + 1) * 72], "little") % modulus
        for i in range(table.n_cons)
    ]
