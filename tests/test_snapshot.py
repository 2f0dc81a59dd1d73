"""Quantized-snapshot save/load (fastdm_tpu/models/snapshot.py): safetensors
writer roundtrip, pytree skeleton fidelity, engine-level snapshot cache
(first ctor writes, second ctor loads bit-identical params and skips
quantization), and stale-snapshot rejection."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))


def test_write_safetensors_roundtrip(tmp_path):
    import ml_dtypes

    from fastdm_tpu.native.safetensors_io import (
        read_safetensors, write_safetensors,
    )

    rng = np.random.default_rng(0)
    tensors = {
        "a/int8": rng.integers(-128, 127, (5, 7), dtype=np.int8),
        "b/bf16": rng.standard_normal((3, 4)).astype(ml_dtypes.bfloat16),
        "c/f32": rng.standard_normal((2, 2, 2)).astype(np.float32),
        "d/u8": rng.integers(0, 255, (9,), dtype=np.uint8),
        "f/fp8": rng.standard_normal((4, 4)).astype(ml_dtypes.float8_e4m3fn),
    }
    path = str(tmp_path / "t.safetensors")
    write_safetensors(path, tensors, metadata={"who": "test"})
    back = read_safetensors(path)
    assert set(back) == set(tensors)
    for k, v in tensors.items():
        got = back[k]
        assert got.dtype == np.asarray(v).dtype and got.shape == np.asarray(v).shape
        assert np.array_equal(
            np.asarray(got).view(np.uint8), np.asarray(v).view(np.uint8)), k

    # the standard safetensors package must also read our file (format parity)
    from safetensors import safe_open

    with safe_open(path, framework="numpy") as sf:
        assert set(sf.keys()) == set(tensors)
        assert np.array_equal(sf.get_tensor("a/int8"), tensors["a/int8"])


def test_snapshot_tree_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from fastdm_tpu.models import snapshot as snap

    tree = {
        "w": jnp.asarray(np.arange(12, dtype=np.int8).reshape(3, 4)),
        "scale": jnp.ones((4,), jnp.float32),
        "nested": {
            "bias": None,
            "lst": [jnp.zeros((2,), jnp.bfloat16), jnp.ones((2,), jnp.bfloat16)],
            "tup": (jnp.full((1,), 7, jnp.int32),),
            "flag": True,
            "name": "qkv",
            "rank": 32,
            "zero_d": jnp.asarray(1.5, jnp.bfloat16),  # 0-d array leaf
        },
    }
    snap.save_snapshot(str(tmp_path), {"transformer": tree},
                       architecture="flux-dev", quant="int8", cfg=None)
    assert snap.is_snapshot(str(tmp_path))
    back = snap.load_tree(str(tmp_path), "transformer")
    assert jax.tree.structure(back) == jax.tree.structure(tree)
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(tree)):
        if isinstance(b, jax.Array):
            assert a.dtype == b.dtype
            assert np.array_equal(np.asarray(a), np.asarray(b))
        else:
            assert a == b
    # structure kinds preserved exactly
    assert back["nested"]["bias"] is None
    assert isinstance(back["nested"]["lst"], list)
    assert isinstance(back["nested"]["tup"], tuple)
    assert back["nested"]["name"] == "qkv" and back["nested"]["rank"] == 32

    with pytest.raises(KeyError, match="no tree"):
        snap.load_tree(str(tmp_path), "missing")


def _tiny_flux_root(tmp_path, monkeypatch):
    import fastdm_tpu.engine as engine_mod
    from fastdm_tpu.pipeline.vae import VAEConfig
    from test_engine_e2e import TINY, _flux_transformer_sd, _vae_sd, _write_st

    rng = np.random.default_rng(0)
    root = str(tmp_path / "flux-tiny")
    _write_st(os.path.join(root, "transformer", "model.safetensors"),
              _flux_transformer_sd(rng))
    with open(os.path.join(root, "transformer", "config.json"), "w") as f:
        json.dump(TINY, f)
    _write_st(os.path.join(root, "vae", "model.safetensors"), _vae_sd(rng))
    monkeypatch.setitem(
        engine_mod.VAE_CONFIGS, "flux",
        VAEConfig(latent_channels=4, block_out_channels=(8, 8, 8, 8),
                  layers_per_block=1, norm_num_groups=4,
                  scaling_factor=0.5, shift_factor=0.0),
    )
    return root, rng


def test_engine_snapshot_cache_roundtrip(tmp_path, monkeypatch):
    """First engine writes the snapshot; second engine loads params from it
    bit-identically WITHOUT touching the transformer checkpoint."""
    import jax
    import jax.numpy as jnp

    from fastdm_tpu.engine import FastDMEngine
    from fastdm_tpu.models import snapshot as snap
    from test_engine_e2e import TINY

    root, rng = _tiny_flux_root(tmp_path, monkeypatch)
    snap_dir = str(tmp_path / "snap")

    eng1 = FastDMEngine(root, architecture="flux", use_int8=True,
                        verbose=False, snapshot_path=snap_dir)
    assert snap.is_snapshot(snap_dir)
    m = snap.load_manifest(snap_dir)
    assert m["architecture"] == "flux" and m["quant"] == "int8"
    assert list(m["trees"]) == ["transformer"]

    # break the original transformer checkpoint: the snapshot engine must
    # never read it (the provenance gate sees the changed file, so the
    # known-identical override is required to even reach the load path)
    os.rename(os.path.join(root, "transformer", "model.safetensors"),
              os.path.join(root, "transformer", "model.safetensors.bak"))
    with open(os.path.join(root, "transformer", "model.safetensors"), "w") as f:
        f.write("not a checkpoint")
    monkeypatch.setenv("FASTDM_SNAPSHOT_ALLOW_MISMATCH", "1")
    eng2 = FastDMEngine(root, architecture="flux", use_int8=True,
                        verbose=False, snapshot_path=snap_dir)
    monkeypatch.delenv("FASTDM_SNAPSHOT_ALLOW_MISMATCH")

    for a, b in zip(jax.tree.leaves(eng1.params), jax.tree.leaves(eng2.params)):
        assert a.dtype == b.dtype
        assert np.array_equal(np.asarray(a), np.asarray(b))

    embeds = jnp.asarray(
        rng.standard_normal((1, 12, TINY["joint_attention_dim"])), jnp.bfloat16)
    pooled = jnp.asarray(
        rng.standard_normal((1, TINY["pooled_projection_dim"])), jnp.bfloat16)
    kw = dict(prompt_embeds=embeds, pooled_prompt_embeds=pooled,
              height=64, width=64, num_inference_steps=2, seed=1)
    img1 = eng1.generate(**kw)
    img2 = eng2.generate(**kw)
    assert np.array_equal(img1, img2)  # same params, same program


def test_engine_snapshot_wan_dual_expert_offload(tmp_path):
    """Dual-expert wan snapshot: BOTH expert trees round-trip, and under
    offload_inactive_expert the snapshot load lands in HOST RAM (the
    _load_tree call runs inside the engine's default_device(cpu) scope)."""
    import jax
    import jax.numpy as jnp

    from fastdm_tpu.engine import FastDMEngine
    from fastdm_tpu.models import snapshot as snap
    from test_engine_e2e import _write_st
    from test_golden_wan import TINY as WAN_TINY, _state_dict

    rng = np.random.default_rng(31)
    root = str(tmp_path / "wan-a14b-tiny")
    _write_st(os.path.join(root, "transformer", "model.safetensors"),
              _state_dict(rng))
    _write_st(os.path.join(root, "transformer_2", "model.safetensors"),
              _state_dict(np.random.default_rng(32)))
    cfg_json = dict(WAN_TINY)
    cfg_json["patch_size"] = [1, 2, 2]
    for sub in ("transformer", "transformer_2"):
        with open(os.path.join(root, sub, "config.json"), "w") as f:
            json.dump(cfg_json, f)
    with open(os.path.join(root, "model_index.json"), "w") as f:
        json.dump({"boundary_ratio": 0.5}, f)

    snap_dir = str(tmp_path / "snap")
    kw = dict(architecture="wan2.2-t2v", use_int8=True, verbose=False,
              offload_inactive_expert=True, snapshot_path=snap_dir)
    eng1 = FastDMEngine(root, **kw)
    m = snap.load_manifest(snap_dir)
    assert sorted(m["trees"]) == ["transformer", "transformer_2"]

    eng2 = FastDMEngine(root, **kw)
    for tree1, tree2 in ((eng1.params, eng2.params),
                         (eng1.params_2, eng2.params_2)):
        for a, b in zip(jax.tree.leaves(tree1), jax.tree.leaves(tree2)):
            assert np.array_equal(np.asarray(a), np.asarray(b))
            # offload: snapshot load must land on host, not the accelerator
            assert list(b.devices())[0].platform == "cpu"

    class _FakeTE:
        def encode(self, prompt):
            r = np.random.default_rng(abs(hash(str(prompt))) % 2**31)
            return jnp.asarray(
                r.standard_normal((1, 8, WAN_TINY["text_dim"])), jnp.bfloat16)

    for e in (eng1, eng2):
        e.text_encoder = _FakeTE()
        e.cfg = __import__("dataclasses").replace(e.cfg, text_len=8)
    gen = dict(prompt="a storm", negative_prompt="calm", height=32, width=32,
               num_frames=5, num_inference_steps=2, output_type="latent",
               seed=4)
    np.testing.assert_array_equal(eng1.generate(**gen), eng2.generate(**gen))


def test_engine_snapshot_rejects_stale(tmp_path, monkeypatch):
    """A snapshot built under different quant/config flags must raise, not
    silently serve wrong weights."""
    from fastdm_tpu.engine import FastDMEngine

    root, _ = _tiny_flux_root(tmp_path, monkeypatch)
    snap_dir = str(tmp_path / "snap")
    FastDMEngine(root, architecture="flux", use_int8=True, verbose=False,
                 snapshot_path=snap_dir)

    with pytest.raises(ValueError, match="incompatible"):
        FastDMEngine(root, architecture="flux", use_fp8=True, verbose=False,
                     snapshot_path=snap_dir)
    with pytest.raises(ValueError, match="incompatible"):
        FastDMEngine(root, architecture="flux-krea", use_int8=True,
                     verbose=False, snapshot_path=snap_dir)
    # matching flags still load fine after the rejections
    eng = FastDMEngine(root, architecture="flux", use_int8=True, verbose=False,
                       snapshot_path=snap_dir)
    assert eng.params is not None


def test_engine_snapshot_rejects_changed_weights(tmp_path, monkeypatch):
    """Weight-provenance gate (ADVICE r3): a checkpoint updated in place at
    the same path (size/mtime fingerprint differs) must raise instead of
    silently serving the stale snapshot; the explicit override env restores
    the old behavior."""
    from fastdm_tpu.engine import FastDMEngine

    root, _ = _tiny_flux_root(tmp_path, monkeypatch)
    snap_dir = str(tmp_path / "snap")
    FastDMEngine(root, architecture="flux", use_int8=True, verbose=False,
                 snapshot_path=snap_dir)

    ckpt = os.path.join(root, "transformer", "model.safetensors")
    with open(ckpt, "ab") as f:  # in-place update: same path, new content
        f.write(b"\0" * 16)
    with pytest.raises(ValueError, match="weight files differ"):
        FastDMEngine(root, architecture="flux", use_int8=True, verbose=False,
                     snapshot_path=snap_dir)
    monkeypatch.setenv("FASTDM_SNAPSHOT_ALLOW_MISMATCH", "1")
    eng = FastDMEngine(root, architecture="flux", use_int8=True, verbose=False,
                       snapshot_path=snap_dir)
    assert eng.params is not None


def test_snapshot_manifest_cfg_pinned_at_init(tmp_path, monkeypatch):
    """save_quantized after generate-time cfg tuning (wan replaces
    sparse_gather_* fields on self.cfg) must bake the INIT-time cfg, so the
    snapshot still passes check_compatible on the next engine start
    (ADVICE r3). Simulated by replacing a cfg field before saving."""
    import dataclasses

    from fastdm_tpu.engine import FastDMEngine

    root, _ = _tiny_flux_root(tmp_path, monkeypatch)
    snap_dir = str(tmp_path / "snap")
    eng = FastDMEngine(root, architecture="flux", use_int8=True, verbose=False)
    # simulate a runtime dataclasses.replace tuning (any fingerprinted field)
    eng.cfg = dataclasses.replace(eng.cfg, guidance_embeds=not eng.cfg.guidance_embeds)
    eng.save_quantized(snap_dir)
    eng.cfg = dataclasses.replace(eng.cfg, guidance_embeds=not eng.cfg.guidance_embeds)

    eng2 = FastDMEngine(root, architecture="flux", use_int8=True, verbose=False,
                        snapshot_path=snap_dir)  # must NOT raise incompatible
    import jax
    for a, b in zip(jax.tree.leaves(eng.params), jax.tree.leaves(eng2.params)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_write_safetensors_refuses_ambiguous_uint16(monkeypatch):
    """Without ml_dtypes the reader returns BF16 as uint16 bit views; the
    writer must refuse uint16 arrays in that environment rather than guess a
    tag (either choice mislabels one of the two cases) — ADVICE r3."""
    from fastdm_tpu.native import safetensors_io as sio

    no_ml = dict(sio._DTYPES)
    no_ml["BF16"] = np.uint16
    no_ml.pop("F8_E4M3", None)
    no_ml.pop("F8_E5M2", None)
    monkeypatch.setattr(sio, "_DTYPES", no_ml)
    with pytest.raises(ValueError, match="no safetensors dtype tag"):
        sio.write_safetensors("/tmp/never-written.safetensors",
                              {"x": np.zeros((2,), np.uint16)})
    # unambiguous dtypes still write fine in the same environment
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "ok.safetensors")
        sio.write_safetensors(p, {"y": np.ones((3,), np.float32)})
        assert os.path.exists(p)
