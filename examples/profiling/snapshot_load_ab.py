"""Quantized-snapshot load-time A/B at REAL FLUX-dev scale (12B params).

Measures the production-restart story of fastdm_tpu/models/snapshot.py:
  A. cold load: safetensors parse -> qkv/mlp fusion -> int8 per-channel
     quantization -> block stacking (what the reference re-runs on every
     engine start, ref: fastdm/layer/qlinear.py:18-54 per load)
  B. save_snapshot of the quantized trees
  C. snapshot reload (mmap -> arrays, zero quantization work)

Host-side only (forces jax CPU): isolates the load pipeline from the axon
tunnel's transfer bandwidth, which is an artifact of this dev setup, not of
a real TPU deployment. The synthetic checkpoint is bf16 at the exact
FLUX-dev architecture, sharded like diffusers ships it; tensor VALUES are
tiled random (quantization cost is value-independent).

Run: nohup python -u examples/profiling/snapshot_load_ab.py > /tmp/snap_ab.log 2>&1 &
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import ml_dtypes  # noqa: E402
import numpy as np  # noqa: E402

WORK = os.environ.get("SNAP_AB_DIR", "/tmp/snap_ab")
SHARD_BYTES = 5 * 1024**3

FLUX_DEV = dict(
    num_layers=19, num_single_layers=38, attention_head_dim=128,
    num_attention_heads=24, joint_attention_dim=4096,
    pooled_projection_dim=768, in_channels=64, out_channels=64,
    axes_dims_rope=(16, 56, 56), guidance_embeds=True, patch_size=1,
)


class _TiledRNG:
    """rng.standard_normal(shape) built by tiling one random MB — checkpoint
    synthesis at memcpy speed (values don't affect load timing)."""

    def __init__(self, seed=0):
        self._base = np.random.default_rng(seed).standard_normal(
            1 << 18).astype(np.float32)

    def standard_normal(self, shape):
        return np.resize(self._base, shape)


def build_checkpoint(tdir):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "tests"))
    from test_golden_flux import _synthetic_state_dict

    from fastdm_tpu.native.safetensors_io import write_safetensors

    os.makedirs(tdir, exist_ok=True)
    sd = _synthetic_state_dict(FLUX_DEV, _TiledRNG())
    total = 0
    shard, shard_bytes, shard_idx = {}, 0, 0

    def flush():
        nonlocal shard, shard_bytes, shard_idx
        if shard:
            write_safetensors(
                os.path.join(tdir, f"model-{shard_idx:05d}.safetensors"), shard)
            shard, shard_bytes, shard_idx = {}, 0, shard_idx + 1

    for k in list(sd):
        arr = sd.pop(k).astype(ml_dtypes.bfloat16)
        shard[k] = arr
        shard_bytes += arr.nbytes
        total += arr.nbytes
        if shard_bytes >= SHARD_BYTES:
            flush()
    flush()
    return total


def main():
    from fastdm_tpu.models import snapshot as snap
    from fastdm_tpu.models.flux import FluxConfig, flux_load
    from fastdm_tpu.models.loader import TensorSource

    tdir = os.path.join(WORK, "transformer")
    snap_dir = os.path.join(WORK, "snapshot")
    reload_only = os.environ.get("SNAP_AB_RELOAD_ONLY") == "1" and \
        os.path.isfile(os.path.join(snap_dir, "fastdm_snapshot.json"))
    if reload_only:
        t0 = time.perf_counter()
        params2 = snap.load_tree(snap_dir, "transformer")
        for leaf in jax.tree.leaves(params2):
            np.asarray(leaf).view(np.uint8).max()
        print(f"C'. snapshot reload (fully materialized, quiet machine): "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        return
    shutil.rmtree(snap_dir, ignore_errors=True)

    if not os.path.isdir(tdir) or not os.listdir(tdir):
        t0 = time.perf_counter()
        total = build_checkpoint(tdir)
        print(f"synthetic FLUX-dev checkpoint: {total/2**30:.1f} GiB bf16 "
              f"in {time.perf_counter()-t0:.1f}s", flush=True)

    cfg = FluxConfig(quant="int8", quant_mods=True)

    t0 = time.perf_counter()
    params = flux_load(TensorSource.from_path(tdir), cfg)
    jax.block_until_ready(jax.tree.leaves(params)[0])
    t_cold = time.perf_counter() - t0
    n_bytes = sum(np.asarray(l).nbytes for l in jax.tree.leaves(params))
    print(f"A. cold load (parse+fuse+quantize+stack): {t_cold:.1f}s "
          f"-> {n_bytes/2**30:.1f} GiB quantized tree", flush=True)

    t0 = time.perf_counter()
    snap.save_snapshot(snap_dir, {"transformer": params},
                       architecture="flux-dev", quant="int8", cfg=cfg)
    t_save = time.perf_counter() - t0
    print(f"B. save_snapshot: {t_save:.1f}s", flush=True)

    # The native reader returns mmap-backed arrays, so load_tree alone is
    # lazy (milliseconds). Force every byte through the CPU inside the timed
    # region — on a real TPU restart this cost is the h2d transfer that
    # materializes the mapping, so counting it keeps the number honest.
    t0 = time.perf_counter()
    params2 = snap.load_tree(snap_dir, "transformer")
    for leaf in jax.tree.leaves(params2):
        np.asarray(leaf).max()
    t_snap = time.perf_counter() - t0
    print(f"C. snapshot reload (fully materialized): {t_snap:.1f}s  "
          f"({t_cold/t_snap:.1f}x faster than cold)", flush=True)

    # spot-check bit-identity on a few leaves
    a, b = jax.tree.leaves(params), jax.tree.leaves(params2)
    assert len(a) == len(b)
    for i in range(0, len(a), max(1, len(a) // 7)):
        assert np.array_equal(np.asarray(a[i]), np.asarray(b[i]))
    print("bit-identity spot checks passed", flush=True)


if __name__ == "__main__":
    main()
