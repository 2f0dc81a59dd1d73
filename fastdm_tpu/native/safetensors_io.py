"""Zero-copy safetensors reading over the native mmap reader.

`read_safetensors(path)` returns {name: np.ndarray} where each array is a
read-only view into the mmapped file — no per-tensor copy, and the OS pages
data in lazily (st_prefetch issues readahead for the data section). Falls
back to the `safetensors` package if the native library can't build.

TPU-native analog of the reference's rust-backed safetensors loading
(ref: fastdm/model/basemodel.py:70-126 checkpoint ingestion).
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "safetensors_reader.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_native_safetensors.so")
_LIB = None

# safetensors dtype tag -> numpy dtype (F8/BF16 via ml_dtypes when present)
def _dtype_map():
    m = {
        "F64": np.float64, "F32": np.float32, "F16": np.float16,
        "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
        "U64": np.uint64, "U32": np.uint32, "U16": np.uint16, "U8": np.uint8,
        "BOOL": np.bool_,
    }
    try:
        import ml_dtypes

        m["BF16"] = ml_dtypes.bfloat16
        m["F8_E4M3"] = ml_dtypes.float8_e4m3fn
        m["F8_E5M2"] = ml_dtypes.float8_e5m2
    except ImportError:  # pragma: no cover
        m["BF16"] = np.uint16  # bit view; callers must convert
    return m


_DTYPES = _dtype_map()

# mmap handle CACHE keyed by realpath: the returned arrays are zero-copy
# views into the mapping, so a handle must outlive every view — but
# re-loading the same checkpoint (model switches in a long-lived server)
# must REUSE its mapping rather than stack a new one per load. Growth is
# bounded by the number of distinct checkpoint files; atexit unmaps all.
_OPEN_HANDLES: Dict[str, int] = {}


def _close_all_handles() -> None:  # pragma: no cover - atexit
    lib = _LIB or None
    if lib:
        for h in _OPEN_HANDLES.values():
            lib.st_close(h)
    _OPEN_HANDLES.clear()


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is None:
        try:
            from fastdm_tpu.native import build_and_load

            lib = build_and_load(_SRC, _SO)
            lib.st_open.restype = ctypes.c_void_p
            lib.st_open.argtypes = [ctypes.c_char_p]
            lib.st_error.restype = ctypes.c_char_p
            lib.st_count.restype = ctypes.c_int64
            lib.st_count.argtypes = [ctypes.c_void_p]
            lib.st_name.restype = ctypes.c_char_p
            lib.st_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
            lib.st_dtype.restype = ctypes.c_char_p
            lib.st_dtype.argtypes = [ctypes.c_void_p, ctypes.c_int64]
            lib.st_shape.restype = ctypes.c_int
            lib.st_shape.argtypes = [
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ]
            lib.st_offsets.argtypes = [
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ]
            lib.st_base.restype = ctypes.c_void_p
            lib.st_base.argtypes = [ctypes.c_void_p]
            lib.st_prefetch.argtypes = [ctypes.c_void_p]
            lib.st_close.argtypes = [ctypes.c_void_p]
            import atexit

            atexit.register(_close_all_handles)
            _LIB = lib
        except Exception:
            _LIB = False
    return _LIB or None


def read_file_native(path: str) -> Dict[str, np.ndarray]:
    """Read one .safetensors file into zero-copy read-only views."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native safetensors reader unavailable")
    st = os.stat(path)
    # keyed by (file identity, mtime, size): a re-downloaded checkpoint at
    # the same path gets a fresh mapping; the old one stays alive for any
    # views still referencing it
    key = (os.path.realpath(path), st.st_mtime_ns, st.st_size)
    h = _OPEN_HANDLES.get(key)
    if h is None:
        h = lib.st_open(path.encode())
        if not h:
            raise OSError(lib.st_error().decode() or f"st_open failed: {path}")
    try:
        lib.st_prefetch(h)
        base = lib.st_base(h)
        out: Dict[str, np.ndarray] = {}
        shape_buf = (ctypes.c_int64 * 16)()
        begin = ctypes.c_int64()
        nbytes = ctypes.c_int64()
        for i in range(lib.st_count(h)):
            name = lib.st_name(h, i).decode()
            tag = lib.st_dtype(h, i).decode()
            ndim = lib.st_shape(h, i, shape_buf, 16)
            if ndim < 0:
                raise ValueError(f"tensor {name!r} has more than 16 dims")
            if tag not in _DTYPES:
                raise ValueError(f"unsupported dtype {tag!r} for tensor {name!r}")
            shape = tuple(shape_buf[d] for d in range(ndim))
            lib.st_offsets(h, i, ctypes.byref(begin), ctypes.byref(nbytes))
            dt = np.dtype(_DTYPES[tag])
            count = int(np.prod(shape, dtype=np.int64)) if shape else 1
            if count * dt.itemsize != nbytes.value:
                raise ValueError(f"size mismatch for {name!r}")
            if nbytes.value == 0:
                arr = np.empty(shape, dt)
            else:
                raw = (ctypes.c_ubyte * nbytes.value).from_address(base + begin.value)
                arr = np.frombuffer(raw, dtype=dt, count=count).reshape(shape)
                arr.flags.writeable = False
            out[name] = arr
    except Exception:
        # don't cache (or leak) the mapping when the parse fails and the
        # caller falls back to the safetensors package
        if key not in _OPEN_HANDLES:
            lib.st_close(h)
        raise
    _OPEN_HANDLES[key] = h
    return out


def write_safetensors(path: str, tensors: Dict[str, np.ndarray],
                      metadata: Optional[Dict[str, str]] = None) -> None:
    """Write {name: array} as one .safetensors file (format spec:
    u64-LE header length, JSON header with dtype/shape/data_offsets, raw
    little-endian data). Sequential buffered IO — no native code needed on
    the write side. Atomic via rename (crash mid-write leaves no torn file,
    same discipline as the native .so builds)."""
    import json as _json
    import struct

    # write-side inverse map from UNAMBIGUOUS entries only: without ml_dtypes
    # the reader maps BF16 -> np.uint16 as a bit view, and letting that entry
    # into the inverse map would tag genuine uint16 arrays as "BF16" (and
    # bf16 bit views as "U16") — both mislabeled files. Skip it and refuse
    # uint16 writes outright in that (ambiguous) environment.
    inv = {}
    bf16_is_view = np.dtype(_DTYPES["BF16"]) == np.dtype(np.uint16)
    for k, v in _DTYPES.items():
        if bf16_is_view and k in ("BF16", "U16"):
            continue  # a uint16 array could be either tag: refuse, don't guess
        inv[np.dtype(v)] = k
    header: Dict[str, object] = {}
    if metadata:
        header["__metadata__"] = {k: str(v) for k, v in metadata.items()}
    offset = 0
    arrays = []
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        tag = inv.get(arr.dtype)
        if tag is None:
            raise ValueError(f"no safetensors dtype tag for {arr.dtype} ({name!r})")
        header[name] = {"dtype": tag, "shape": list(arr.shape),
                        "data_offsets": [offset, offset + arr.nbytes]}
        arrays.append(arr)
        offset += arr.nbytes
    hb = _json.dumps(header, separators=(",", ":")).encode("utf-8")
    hb += b" " * ((-(8 + len(hb))) % 8)  # 8-byte-align the data section
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(struct.pack("<Q", len(hb)))
        f.write(hb)
        for arr in arrays:
            f.write(arr.tobytes())
    os.replace(tmp, path)


def read_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Read a .safetensors file or a directory tree of them; native reader
    with a `safetensors`-package fallback."""
    files = []
    if os.path.isdir(path):
        for root, _, names in os.walk(path):
            files += [os.path.join(root, n) for n in names if n.endswith(".safetensors")]
    else:
        files = [path]
    tensors: Dict[str, np.ndarray] = {}
    for f in sorted(files):
        try:
            tensors.update(read_file_native(f))
        except (RuntimeError, OSError, ValueError):
            from safetensors import safe_open

            with safe_open(f, framework="numpy") as sf:
                for k in sf.keys():
                    tensors[k] = sf.get_tensor(k)
    return tensors
