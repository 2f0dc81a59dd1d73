"""Native (C++) host runtime pieces, loaded via ctypes.

Builds quant.cpp into a shared library on first use (g++ is in the image;
pybind11 is not, hence the plain C ABI). The TPU compute path stays
jax/pallas; this covers the host side of the runtime the reference implements
natively (load-time quantization, format conversion — ref: csrc/ +
fastdm/utils/quantization.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB = None
_SRC = os.path.join(os.path.dirname(__file__), "quant.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_native_quant.so")


def _build() -> str:
    src_mtime = os.path.getmtime(_SRC)
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < src_mtime:
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
               "-pthread", _SRC, "-o", _SO]
        subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB
    if _LIB is None:
        try:
            _LIB = ctypes.CDLL(_build())
            i64, i32p = ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)
            u16p = ctypes.POINTER(ctypes.c_uint16)
            i8p = ctypes.POINTER(ctypes.c_int8)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            f32p = ctypes.POINTER(ctypes.c_float)
            _LIB.quantize_int8_percol_bf16.argtypes = [
                u16p, i64, i64, i8p, f32p, i32p, ctypes.c_int]
            _LIB.quantize_int8_percol_f32.argtypes = [
                f32p, i64, i64, i8p, f32p, i32p, ctypes.c_int]
            _LIB.quantize_fp8_percol_bf16.argtypes = [
                u16p, i64, i64, u8p, f32p, ctypes.c_int]
            _LIB.bf16_to_f32_buf.argtypes = [u16p, f32p, i64, ctypes.c_int]
        except Exception:
            _LIB = False  # build failed; callers fall back to jnp path
    return _LIB or None


def quantize_int8_percol(w: np.ndarray, nthreads: int = 0) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-output-channel symmetric int8 quantization of a checkpoint-layout
    (out, in) weight. Returns (q (out,in) int8, scale (out,) f32, colsum i32).

    Accepts f32 or bf16 (ml_dtypes / uint16-view) arrays; threads across rows.
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native quant library unavailable")
    n, k = w.shape
    nthreads = nthreads or min(32, os.cpu_count() or 1)
    q = np.empty((n, k), np.int8)
    scale = np.empty((n,), np.float32)
    colsum = np.empty((n,), np.int32)
    w = np.ascontiguousarray(w)
    if w.dtype == np.float32:
        lib.quantize_int8_percol_f32(
            w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, k,
            q.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            scale.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            colsum.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), nthreads)
    else:
        w16 = w.view(np.uint16) if w.dtype != np.uint16 else w
        lib.quantize_int8_percol_bf16(
            w16.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), n, k,
            q.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            scale.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            colsum.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), nthreads)
    return q, scale, colsum


def quantize_fp8_percol(w_bf16: np.ndarray, nthreads: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Per-output-channel e4m3fn quantization; returns (q uint8 bits, scale)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native quant library unavailable")
    n, k = w_bf16.shape
    nthreads = nthreads or min(32, os.cpu_count() or 1)
    q = np.empty((n, k), np.uint8)
    scale = np.empty((n,), np.float32)
    w16 = np.ascontiguousarray(w_bf16).view(np.uint16)
    lib.quantize_fp8_percol_bf16(
        w16.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), n, k,
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        scale.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nthreads)
    return q, scale
