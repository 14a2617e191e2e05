"""ctypes bindings for the native terrain generator (native/libobb_terrain.so).

The C++ library (native/terrain/simplex_terrain.cpp) implements the same
simplex/fbm pipeline as terrain/simplex.py over the same permutation table;
`perlin_bank_native` produces whole terrain banks on host cores (OpenMP) so
bank regeneration overlaps TPU training. Falls back cleanly when the library
is not built (`make -C native`).
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.abspath(__file__))
    for cand in (
        os.path.join(here, "..", "..", "native", "libobb_terrain.so"),
        os.path.join(here, "libobb_terrain.so"),
    ):
        if os.path.exists(cand):
            return cand
    return None


def load_native() -> Optional[ctypes.CDLL]:
    """Load (once) and return the native library, or None if unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.obb_perlin_terrain.argtypes = [
        ctypes.c_int, ctypes.c_float, ctypes.c_int, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")]
    lib.obb_perlin_bank.argtypes = [
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_float, ctypes.c_int, ctypes.c_float,
        ctypes.c_float, ctypes.c_float,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")]
    _LIB = lib
    return lib


def native_available() -> bool:
    return load_native() is not None


def perlin_terrain_native(n: int, scale: float = 25.0, octaves: int = 4,
                          persistence: float = 0.2, lacunarity: float = 2.0,
                          amplitude: float = 1.0, seed: int = 0) -> np.ndarray:
    """(n*n,) float32 heights; value-parity with generate_perlin_terrain."""
    lib = load_native()
    if lib is None:
        raise RuntimeError("native terrain library not built "
                           "(run `make -C native`)")
    out = np.empty(n * n, np.float32)
    lib.obb_perlin_terrain(n, float(scale), int(octaves), float(persistence),
                           float(lacunarity), float(amplitude),
                           int(0 if seed is None else seed), out)
    return out


def perlin_bank_native(seeds, n: int, scale: float = 25.0, octaves: int = 4,
                       persistence: float = 0.2, lacunarity: float = 2.0,
                       amplitude: float = 1.0) -> np.ndarray:
    """(len(seeds), n, n) float32 bank, generated in parallel on host cores."""
    lib = load_native()
    if lib is None:
        raise RuntimeError("native terrain library not built "
                           "(run `make -C native`)")
    seeds = np.ascontiguousarray(np.asarray(seeds, np.int32))
    out = np.empty((len(seeds), n, n), np.float32)
    lib.obb_perlin_bank(len(seeds), seeds, n, float(scale), int(octaves),
                        float(persistence), float(lacunarity),
                        float(amplitude), out.reshape(-1))
    return out
