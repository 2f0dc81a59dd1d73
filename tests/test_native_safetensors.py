"""Native mmap safetensors reader vs the safetensors package (oracle)."""

import numpy as np
import pytest


def _write(path, tensors):
    from safetensors.numpy import save_file

    save_file(tensors, path, metadata={"written_by": "fastdm_tpu tests"})


def test_native_reader_matches_package(tmp_path):
    from fastdm_tpu.native.safetensors_io import get_lib, read_file_native

    if get_lib() is None:
        pytest.skip("g++ unavailable")
    import ml_dtypes

    rng = np.random.default_rng(0)
    tensors = {
        "a.weight": rng.standard_normal((4, 7)).astype(np.float32),
        "a.bias": rng.standard_normal((7,)).astype(np.float32),
        "b.weight": rng.standard_normal((3, 2, 5)).astype(np.float16),
        "c.int8": rng.integers(-128, 128, (9, 3)).astype(np.int8),
        "d.bf16": rng.standard_normal((6, 6)).astype(ml_dtypes.bfloat16),
        "e.scalar": np.asarray(3.5, np.float32),
    }
    f = str(tmp_path / "x.safetensors")
    _write(f, tensors)

    out = read_file_native(f)
    assert set(out) == set(tensors)
    for k, v in tensors.items():
        got = out[k]
        assert got.shape == v.shape and got.dtype == v.dtype, k
        np.testing.assert_array_equal(np.asarray(got), v)
        if got.size:
            assert not got.flags.writeable  # zero-copy views are read-only


def test_native_reader_dir_and_source(tmp_path):
    from fastdm_tpu.models.loader import TensorSource

    rng = np.random.default_rng(1)
    d = tmp_path / "ckpt"
    d.mkdir()
    _write(str(d / "a.safetensors"), {"x": rng.standard_normal((2, 2)).astype(np.float32)})
    _write(str(d / "b.safetensors"), {"y": rng.standard_normal((3,)).astype(np.float32)})
    src = TensorSource.from_path(str(d))
    assert "x" in src and "y" in src
    assert src.take("y").shape == (3,)


def test_native_reader_bad_file(tmp_path):
    from fastdm_tpu.native.safetensors_io import get_lib, read_file_native

    if get_lib() is None:
        pytest.skip("g++ unavailable")
    bad = tmp_path / "bad.safetensors"
    bad.write_bytes(b"\xff" * 32)  # header length 0xffff... > file size
    with pytest.raises(OSError):
        read_file_native(str(bad))
