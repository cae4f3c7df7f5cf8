"""ctypes bindings for the native host kernels (spark_host.cpp).

Auto-builds libspark_host.so on first import when a compiler is available
(the reference ships its native code prebuilt by CMake; here the library
is one TU so `make` at import time is cheap and keeps the repo
pip-install-free). Every entry point has a numpy fallback, so the
framework works without a toolchain — just slower on the host paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libspark_host.so"
_lib = None
_tried = False


def _build() -> bool:
    try:
        r = subprocess.run(
            ["make", "-C", str(_DIR), "-s"],
            capture_output=True, timeout=120,
        )
        return r.returncode == 0 and _LIB_PATH.exists()
    except Exception:
        return False


def get_lib():
    """The loaded CDLL or None (after one build attempt)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("SPARKINFER_NO_NATIVE"):
        return None
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None

    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i32 = ctypes.c_int32
    i64 = ctypes.c_int64
    f32 = ctypes.c_float

    lib.spif_sparse_complement.argtypes = [
        f32p, f32p, ctypes.c_void_p, f32p, ctypes.c_void_p, f32p, u8p, f32p,
        i32, i32, i32, i32, i32, f32, f32,
    ]
    lib.spif_sparse_complement.restype = None
    try:
        u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
        lib.spif_sparse_complement_f16.argtypes = [
            f32p, u16p, ctypes.c_void_p, u16p, ctypes.c_void_p, f32p, u8p,
            f32p, i32, i32, i32, i32, i32, f32, f32,
        ]
        lib.spif_sparse_complement_f16.restype = None
        lib.spif_has_f16.restype = i32
    except AttributeError:
        pass  # older .so without the f16 entry point
    lib.spif_dequant_q4_0.argtypes = [u8p, f32p, i64]
    lib.spif_dequant_q8_0.argtypes = [u8p, f32p, i64]
    lib.spif_repack_q4_0.argtypes = [u8p, u8p, f32p, i64]
    lib.spif_repack_q8_0.argtypes = [u8p, i8p, f32p, i64]
    lib.spif_reload_plan.argtypes = [i32p, i32, i32p, i32, i32, i32p, i32p]
    lib.spif_reload_plan.restype = i32
    lib.spif_num_threads.restype = i32
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


# --------------------------------------------------------------------------
# typed wrappers

_ACT_KIND = {"relu": 0, "fatrelu": 1, "drelu": 2}


def sparse_complement(
    x: np.ndarray,  # (N, E) f32
    up: np.ndarray,  # (ng, G, E) f32
    gate: np.ndarray | None,
    down: np.ndarray,
    b_up: np.ndarray | None,  # (ng, G) f32
    probs: np.ndarray,  # (N, ng, G) f32
    cold_active: np.ndarray,  # (N, ng) bool/uint8
    act: str,
    fatrelu_thr: float = 0.0,
    prob_thr: float = 0.5,
) -> np.ndarray:
    lib = get_lib()
    N, E = x.shape
    ng, G, _ = up.shape
    out = np.empty((N, E), np.float32)
    ca = np.ascontiguousarray(cold_active, np.uint8)
    if lib is None:
        raise RuntimeError("native library unavailable")
    if up.dtype == np.float16 and has_f16():
        # half-size host store: weights stay f16, converted in HW inside
        # the dot loops (spif_sparse_complement_f16)
        lib.spif_sparse_complement_f16(
            np.ascontiguousarray(x, np.float32),
            np.ascontiguousarray(up).view(np.uint16),
            None if gate is None else np.ascontiguousarray(gate).view(np.uint16).ctypes.data_as(ctypes.c_void_p),
            np.ascontiguousarray(down).view(np.uint16),
            None if b_up is None else np.ascontiguousarray(b_up, np.float32).ctypes.data_as(ctypes.c_void_p),
            np.ascontiguousarray(probs, np.float32),
            ca,
            out,
            N, ng, G, E,
            _ACT_KIND[act], float(fatrelu_thr), float(prob_thr),
        )
        return out
    lib.spif_sparse_complement(
        np.ascontiguousarray(x, np.float32),
        np.ascontiguousarray(up, np.float32),
        None if gate is None else np.ascontiguousarray(gate, np.float32).ctypes.data_as(ctypes.c_void_p),
        np.ascontiguousarray(down, np.float32),
        None if b_up is None else np.ascontiguousarray(b_up, np.float32).ctypes.data_as(ctypes.c_void_p),
        np.ascontiguousarray(probs, np.float32),
        ca,
        out,
        N, ng, G, E,
        _ACT_KIND[act], float(fatrelu_thr), float(prob_thr),
    )
    return out


def has_f16() -> bool:
    lib = get_lib()
    return (lib is not None and hasattr(lib, "spif_has_f16")
            and bool(lib.spif_has_f16()))


def dequant_q4_0(raw: np.ndarray, n_elems: int) -> np.ndarray:
    lib = get_lib()
    nb = n_elems // 32
    out = np.empty(n_elems, np.float32)
    lib.spif_dequant_q4_0(np.ascontiguousarray(raw, np.uint8), out, nb)
    return out


def dequant_q8_0(raw: np.ndarray, n_elems: int) -> np.ndarray:
    lib = get_lib()
    nb = n_elems // 32
    out = np.empty(n_elems, np.float32)
    lib.spif_dequant_q8_0(np.ascontiguousarray(raw, np.uint8), out, nb)
    return out


def repack_q4_0(raw: np.ndarray, out_dim: int, in_dim: int):
    lib = get_lib()
    nb = out_dim * in_dim // 32
    qw = np.empty(nb * 16, np.uint8)
    sc = np.empty(nb, np.float32)
    lib.spif_repack_q4_0(np.ascontiguousarray(raw, np.uint8), qw, sc, nb)
    return qw.reshape(out_dim, in_dim // 2), sc.reshape(out_dim, in_dim // 32)


def repack_q8_0(raw: np.ndarray, out_dim: int, in_dim: int):
    lib = get_lib()
    nb = out_dim * in_dim // 32
    qw = np.empty(nb * 32, np.int8)
    sc = np.empty(nb, np.float32)
    lib.spif_repack_q8_0(np.ascontiguousarray(raw, np.uint8), qw, sc, nb)
    return qw.reshape(out_dim, in_dim), sc.reshape(out_dim, in_dim // 32)


def reload_plan(current_hot: np.ndarray, desired_hot: np.ndarray, window: int):
    lib = get_lib()
    H = len(current_hot)
    slots = np.empty(max(window, 1), np.int32)
    groups = np.empty(max(window, 1), np.int32)
    n = lib.spif_reload_plan(
        np.ascontiguousarray(current_hot, np.int32), H,
        np.ascontiguousarray(desired_hot, np.int32), len(desired_hot),
        window, slots, groups,
    )
    return [(int(slots[i]), int(groups[i])) for i in range(n)]
