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
import tempfile
from typing import Optional, Tuple

import numpy as np

_LIB = None
_SRC = os.path.join(os.path.dirname(__file__), "quant.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_native_quant.so")


def build_and_load(src: str, so: str, extra_flags: Tuple[str, ...] = ()) -> ctypes.CDLL:
    """Compile `src` to `so` (if stale) and dlopen it.

    The compile writes to a temp file in the same directory and os.rename()s
    it into place — atomic on POSIX — so concurrent processes (multi-host
    launch, parallel test workers) never dlopen a half-written ELF or race
    g++ on the same output path. Shared by quant + safetensors readers."""
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=os.path.dirname(so))
        os.close(fd)
        try:
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                   *extra_flags, src, "-o", tmp]
            subprocess.run(cmd, check=True, capture_output=True)
            os.rename(tmp, so)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise
    return ctypes.CDLL(so)


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB
    if _LIB is None:
        try:
            _LIB = build_and_load(_SRC, _SO, ("-march=native", "-pthread"))
            i64, i32p = ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)
            u16p = ctypes.POINTER(ctypes.c_uint16)
            i8p = ctypes.POINTER(ctypes.c_int8)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            f32p = ctypes.POINTER(ctypes.c_float)
            _LIB.quantize_int8_percol_bf16.restype = ctypes.c_int
            _LIB.quantize_int8_percol_bf16.argtypes = [
                u16p, i64, i64, i8p, f32p, i32p, ctypes.c_int]
            _LIB.quantize_int8_percol_f32.restype = ctypes.c_int
            _LIB.quantize_int8_percol_f32.argtypes = [
                f32p, i64, i64, i8p, f32p, i32p, ctypes.c_int]
            _LIB.quantize_fp8_percol_bf16.restype = ctypes.c_int
            _LIB.quantize_fp8_percol_bf16.argtypes = [
                u16p, i64, i64, u8p, f32p, ctypes.c_int]
            _LIB.bf16_to_f32_buf.argtypes = [u16p, f32p, i64, ctypes.c_int]
        except Exception:
            _LIB = False  # build failed; callers fall back to jnp path
    return _LIB or None


def _is_bf16_bits(dtype: np.dtype) -> bool:
    """True when the buffer's 16-bit payload really is bfloat16 bits — an
    ml_dtypes.bfloat16 array or an explicit uint16 bit view. float16 (fp16
    checkpoints!) has a different exponent bias and MUST NOT be
    reinterpreted; it is converted to f32 first."""
    return dtype == np.uint16 or dtype.name == "bfloat16"


def quantize_int8_percol(w: np.ndarray, nthreads: int = 0) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-output-channel symmetric int8 quantization of a checkpoint-layout
    (out, in) weight. Returns (q (out,in) int8, scale (out,) f32, colsum i32).

    Accepts f32 or bf16 natively; anything else (f16/f64 checkpoints) is
    converted to f32 first. Raises on NaN/Inf weights. Threads across rows.
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native quant library unavailable")
    if w.dtype != np.float32 and not _is_bf16_bits(w.dtype):
        w = w.astype(np.float32)
    n, k = w.shape
    nthreads = nthreads or min(32, os.cpu_count() or 1)
    q = np.empty((n, k), np.int8)
    scale = np.empty((n,), np.float32)
    colsum = np.empty((n,), np.int32)
    w = np.ascontiguousarray(w)
    if w.dtype == np.float32:
        bad = lib.quantize_int8_percol_f32(
            w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, k,
            q.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            scale.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            colsum.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), nthreads)
    else:
        w16 = w.view(np.uint16) if w.dtype != np.uint16 else w
        bad = lib.quantize_int8_percol_bf16(
            w16.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), n, k,
            q.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            scale.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            colsum.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), nthreads)
    if bad:
        raise ValueError("checkpoint weight contains NaN/Inf — refusing to "
                         "quantize a corrupted tensor")
    return q, scale, colsum


def quantize_fp8_percol(w_bf16: np.ndarray, nthreads: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Per-output-channel e4m3fn quantization; returns (q uint8 bits, scale).
    Accepts bf16 (or uint16 bit view); other dtypes are converted to bf16
    first. Raises on NaN/Inf weights."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native quant library unavailable")
    if not _is_bf16_bits(w_bf16.dtype):
        import ml_dtypes

        w_bf16 = w_bf16.astype(ml_dtypes.bfloat16)
    n, k = w_bf16.shape
    nthreads = nthreads or min(32, os.cpu_count() or 1)
    q = np.empty((n, k), np.uint8)
    scale = np.empty((n,), np.float32)
    w16 = np.ascontiguousarray(w_bf16).view(np.uint16)
    bad = lib.quantize_fp8_percol_bf16(
        w16.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), n, k,
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        scale.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nthreads)
    if bad:
        raise ValueError("checkpoint weight contains NaN/Inf — refusing to "
                         "quantize a corrupted tensor")
    return q, scale
