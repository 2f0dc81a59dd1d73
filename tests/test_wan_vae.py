"""Wan 3D causal VAE: diffusers AutoencoderKLWan layout loader + the
vectorized cache semantics (pipeline/wan_vae.py).

No real Wan checkpoints or diffusers exist in this image, so the oracle here
is the ARCHITECTURE CONTRACT: a synthetic state dict with the exact diffusers
key names/shapes must load exhaustively, decode must produce the causal
1 + 4(F-1) frame layout at 8x spatial scale, the first frame must bypass the
temporal convs, and the convs must be temporally causal."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastdm_tpu.models.loader import TensorSource
from fastdm_tpu.pipeline.wan_vae import (
    WanVAEConfig,
    wan_vae_decode,
    wan_vae_encode,
    wan_vae_load,
    wan_vae_random,
)

TINY = WanVAEConfig(
    base_dim=8,
    z_dim=4,
    dim_mult=(1, 2, 4, 4),
    num_res_blocks=1,
    temporal_downsample=(False, True, True),
    latents_mean=tuple(0.1 * i for i in range(4)),
    latents_std=tuple(1.0 + 0.1 * i for i in range(4)),
)


def _mk_diffusers_state_dict(cfg: WanVAEConfig):
    """Synthetic AutoencoderKLWan state dict: exact key names and shapes of
    the diffusers module tree (flat down_blocks/up_blocks, resample.1 convs,
    time_conv, RMS 'gamma' params)."""
    rng = np.random.default_rng(0)
    sd = {}

    def conv3d(name, cin, cout, kt=3, kh=3, kw=3):
        sd[f"{name}.weight"] = rng.standard_normal(
            (cout, cin, kt, kh, kw)).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = np.zeros((cout,), np.float32)

    def conv2d(name, cin, cout, k=3):
        sd[f"{name}.weight"] = rng.standard_normal(
            (cout, cin, k, k)).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = np.zeros((cout,), np.float32)

    def norm(name, c, images=False):
        shape = (c, 1, 1) if images else (c, 1, 1, 1)
        sd[f"{name}.gamma"] = np.ones(shape, np.float32)

    def res(name, cin, cout):
        norm(f"{name}.norm1", cin)
        conv3d(f"{name}.conv1", cin, cout)
        norm(f"{name}.norm2", cout)
        conv3d(f"{name}.conv2", cout, cout)
        if cin != cout:
            conv3d(f"{name}.conv_shortcut", cin, cout, kt=1, kh=1, kw=1)

    def attn(name, c):
        norm(f"{name}.norm", c, images=True)
        conv2d(f"{name}.to_qkv", c, 3 * c, k=1)
        conv2d(f"{name}.proj", c, c, k=1)

    def mid(name, c):
        res(f"{name}.resnets.0", c, c)
        attn(f"{name}.attentions.0", c)
        res(f"{name}.resnets.1", c, c)

    n = len(cfg.dim_mult)
    e = cfg.encoder_dims  # (8, 8, 16, 32, 32)
    conv3d("encoder.conv_in", 3, e[0])
    idx = 0
    for i in range(n):
        cin, cout = e[i], e[i + 1]
        for r in range(cfg.num_res_blocks):
            res(f"encoder.down_blocks.{idx}", cin if r == 0 else cout, cout)
            idx += 1
        if i != n - 1:
            conv2d(f"encoder.down_blocks.{idx}.resample.1", cout, cout)
            if cfg.temporal_downsample[i]:
                conv3d(f"encoder.down_blocks.{idx}.time_conv", cout, cout,
                       kt=3, kh=1, kw=1)
            idx += 1
    mid("encoder.mid_block", e[-1])
    norm("encoder.norm_out", e[-1])
    conv3d("encoder.conv_out", e[-1], 2 * cfg.z_dim)
    conv3d("quant_conv", 2 * cfg.z_dim, 2 * cfg.z_dim, kt=1, kh=1, kw=1)

    d = cfg.decoder_dims  # (32, 32, 32, 16, 8)
    conv3d("post_quant_conv", cfg.z_dim, cfg.z_dim, kt=1, kh=1, kw=1)
    conv3d("decoder.conv_in", cfg.z_dim, d[0])
    mid("decoder.mid_block", d[0])
    t_up = tuple(reversed(cfg.temporal_downsample))
    idx = 0
    for i in range(n):
        cin, cout = d[i], d[i + 1]
        if i > 0:
            cin //= 2
        for r in range(cfg.num_res_blocks + 1):
            res(f"decoder.up_blocks.{idx}", cin if r == 0 else cout, cout)
            idx += 1
        if i != n - 1:
            if t_up[i]:
                conv3d(f"decoder.up_blocks.{idx}.time_conv", cout, 2 * cout,
                       kt=3, kh=1, kw=1)
            conv2d(f"decoder.up_blocks.{idx}.resample.1", cout, cout // 2)
            idx += 1
    norm("decoder.norm_out", d[-1])
    conv3d("decoder.conv_out", d[-1], 3)
    return sd


def test_loader_consumes_diffusers_layout():
    src = TensorSource(_mk_diffusers_state_dict(TINY))
    params = wan_vae_load(src, TINY)  # assert_consumed inside
    assert "quant_conv" in params and "post_quant_conv" in params
    assert len(params["decoder"]["up"]) == 4
    # stage 0/1 temporal upsamplers, stage 2 spatial-only, stage 3 none
    assert "time_conv" in params["decoder"]["up"][0]
    assert "time_conv" in params["decoder"]["up"][1]
    assert "time_conv" not in params["decoder"]["up"][2]
    assert "upsample" not in params["decoder"]["up"][3]


def test_decode_frame_layout_and_scale():
    params = wan_vae_load(TensorSource(_mk_diffusers_state_dict(TINY)), TINY)
    t, h, w = 3, 4, 5
    z = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, TINY.z_dim, t, h, w)),
        jnp.float32,
    )
    video = jax.jit(lambda p, z: wan_vae_decode(p, TINY, z))(params, z)
    # 1 + 4(t-1) frames, 8x spatial
    assert video.shape == (1, 1 + 4 * (t - 1), h * 8, w * 8, 3)
    assert np.isfinite(np.asarray(video)).all()


def test_encode_decode_roundtrip_shapes():
    params = wan_vae_load(TensorSource(_mk_diffusers_state_dict(TINY)), TINY)
    f, h, w = 9, 32, 40
    video = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, f, h, w, 3)) * 0.1,
        jnp.float32,
    )
    z = wan_vae_encode(params, TINY, video)
    assert z.shape == (1, TINY.z_dim, 1 + (f - 1) // 4, h // 8, w // 8)
    out = wan_vae_decode(params, TINY, z)
    assert out.shape == (1, f, h, w, 3)


def test_decode_is_temporally_causal():
    """Changing latent frame k must not change output frames before
    1 + 4(k-1) (the causal conv + first-frame-passthrough contract)."""
    params = wan_vae_load(TensorSource(_mk_diffusers_state_dict(TINY)), TINY)
    rng = np.random.default_rng(3)
    z0 = rng.standard_normal((1, TINY.z_dim, 4, 4, 4)).astype(np.float32)
    z1 = z0.copy()
    z1[:, :, 2] += 1.0  # perturb latent frame 2 -> output frames >= 1+4*1 = 5
    v0 = np.asarray(wan_vae_decode(params, TINY, jnp.asarray(z0)))
    v1 = np.asarray(wan_vae_decode(params, TINY, jnp.asarray(z1)))
    assert np.allclose(v0[:, :5], v1[:, :5], atol=1e-3)
    assert not np.allclose(v0[:, 5:], v1[:, 5:], atol=1e-3)


def test_first_frame_independent_of_later_frames():
    """Frame 0 bypasses every temporal conv: decoding only frame 0 equals
    frame 0 of the full decode (the torch chunked decoder's first chunk)."""
    params = wan_vae_load(TensorSource(_mk_diffusers_state_dict(TINY)), TINY)
    rng = np.random.default_rng(4)
    z = rng.standard_normal((1, TINY.z_dim, 3, 4, 4)).astype(np.float32)
    full = np.asarray(wan_vae_decode(params, TINY, jnp.asarray(z)))
    first = np.asarray(wan_vae_decode(params, TINY, jnp.asarray(z[:, :, :1])))
    assert first.shape[1] == 1
    np.testing.assert_allclose(first[:, 0], full[:, 0], atol=2e-2)


def test_random_params_match_loader_structure():
    """wan_vae_random builds the same pytree structure the loader produces."""
    loaded = wan_vae_load(TensorSource(_mk_diffusers_state_dict(TINY)), TINY)
    rand = wan_vae_random(jax.random.key(0), TINY)
    l_tree = jax.tree_util.tree_structure(
        jax.tree_util.tree_map(lambda x: x.shape, loaded)
    )
    r_tree = jax.tree_util.tree_structure(
        jax.tree_util.tree_map(lambda x: x.shape, rand)
    )
    assert l_tree == r_tree
    l_shapes = jax.tree_util.tree_map(lambda x: x.shape, loaded)
    r_shapes = jax.tree_util.tree_map(lambda x: x.shape, rand)
    assert l_shapes == r_shapes


def test_encode_temporal_downsample_count():
    # 1+4k input frames -> after two temporal 2x stages: 1+k latent frames
    params = wan_vae_random(jax.random.key(1), TINY)
    for f in (1, 5, 13):
        video = jnp.zeros((1, f, 16, 16, 3), jnp.float32)
        z = wan_vae_encode(params, TINY, video)
        assert z.shape[2] == 1 + (f - 1) // 4, f


def test_chunked_decode_matches_full():
    """The lax.scan streaming decode (per-conv caches in the carry) must be
    numerically equivalent to the full-sequence decode — same conv windows,
    different walk order."""
    from fastdm_tpu.pipeline.wan_vae import wan_vae_decode_chunked

    params = wan_vae_load(TensorSource(_mk_diffusers_state_dict(TINY)), TINY)
    z = jnp.asarray(
        np.random.default_rng(5).standard_normal((1, TINY.z_dim, 4, 4, 4)),
        jnp.float32,
    )
    full = np.asarray(wan_vae_decode(params, TINY, z))
    chunked = np.asarray(wan_vae_decode_chunked(params, TINY, z))
    assert chunked.shape == full.shape
    # in f32 the two walks agree to 5e-6 (verified; identical conv windows);
    # in bf16 per-layer rounding amplifies through ~14 conv layers
    d = np.abs(chunked - full)
    assert d.max() < 0.12 and d.mean() < 0.01


def test_chunked_decode_single_frame():
    from fastdm_tpu.pipeline.wan_vae import wan_vae_decode_chunked

    params = wan_vae_random(jax.random.key(2), TINY)
    z = jnp.zeros((1, TINY.z_dim, 1, 4, 4), jnp.float32)
    out = wan_vae_decode_chunked(params, TINY, z)
    assert out.shape == (1, 1, 32, 32, 3)


# ---------------------------------------------------------- TI2V patched VAE


def test_patchify_matches_diffusers_order():
    """_patchify_frames must reproduce diffusers AutoencoderKLWan's
    patchify ("b c f (h q) (w r) -> b (c r q) f h w"): channel index
    c*p² + r*p + q with q the h-subpixel and r the w-subpixel."""
    from fastdm_tpu.pipeline.wan_vae import _patchify_frames

    rng = np.random.default_rng(0)
    p, (B, C, F, H, W) = 2, (1, 3, 2, 8, 12)
    v = rng.standard_normal((B, C, F, H, W)).astype(np.float32)
    # reference in the torch NCDHW layout
    ref = v.reshape(B, C, F, H // p, p, W // p, p)         # b c f h q w r
    ref = ref.transpose(0, 1, 6, 4, 2, 3, 5)               # b c r q f h w
    ref = ref.reshape(B, C * p * p, F, H // p, W // p)
    # ours in NDHWC frames layout
    x = jnp.asarray(v.transpose(0, 2, 3, 4, 1))            # (B,F,H,W,C)
    got = np.asarray(_patchify_frames(x, p))               # (B,F,h,w,Cpp)
    np.testing.assert_allclose(got, ref.transpose(0, 2, 3, 4, 1), rtol=0)


def test_patchify_unpatchify_roundtrip():
    from fastdm_tpu.pipeline.wan_vae import (
        _patchify_frames, _unpatchify_frames,
    )

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 3, 8, 12, 3)), jnp.float32)
    y = _unpatchify_frames(_patchify_frames(x, 2), 2)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_patched_vae_encode_decode_shapes():
    """patch_size=2 (Wan2.2-TI2V): effective spatial stride 16."""
    cfg = WanVAEConfig(base_dim=8, z_dim=6, dim_mult=(1, 2, 4, 4),
                       num_res_blocks=1, patch_size=2)
    params = wan_vae_random(jax.random.key(3), cfg)
    f, h, w = 5, 32, 48
    video = jnp.asarray(
        np.random.default_rng(4).standard_normal((1, f, h, w, 3)) * 0.1,
        jnp.float32)
    z = wan_vae_encode(params, cfg, video)
    assert z.shape == (1, cfg.z_dim, 1 + (f - 1) // 4, h // 16, w // 16)
    out = wan_vae_decode(params, cfg, z)
    assert out.shape == (1, f, h, w, 3)


def test_patched_chunked_decode_matches_full():
    from fastdm_tpu.pipeline.wan_vae import wan_vae_decode_chunked

    cfg = WanVAEConfig(base_dim=8, z_dim=6, dim_mult=(1, 2, 4, 4),
                       num_res_blocks=1, patch_size=2)
    params = wan_vae_random(jax.random.key(5), cfg)
    z = jnp.asarray(
        np.random.default_rng(6).standard_normal((1, cfg.z_dim, 3, 4, 4)),
        jnp.float32)
    full = np.asarray(wan_vae_decode(params, cfg, z))
    chunked = np.asarray(wan_vae_decode_chunked(params, cfg, z))
    assert chunked.shape == full.shape
    d = np.abs(chunked - full)
    assert d.max() < 0.12 and d.mean() < 0.01


def _oracle_compare(cfg, lat_shape, seed, monkeypatch, atol):
    """Run the JAX decode in f32 and compare against the independent numpy
    frame-cache oracle (torch NCDHW chunk-walk semantics)."""
    import sys as _sys, os as _os

    _sys.path.insert(0, _os.path.dirname(__file__))
    import fastdm_tpu.pipeline.wan_vae as wv
    from wan_vae_oracle import decode_oracle

    monkeypatch.setattr(wv, "_DTYPE", jnp.float32)
    params = wv.wan_vae_random(jax.random.key(17), cfg)
    z = np.random.default_rng(seed).standard_normal(lat_shape).astype(np.float32)
    got_full = np.asarray(wv.wan_vae_decode(params, cfg, jnp.asarray(z)))
    got_chunk = np.asarray(wv.wan_vae_decode_chunked(params, cfg, jnp.asarray(z)))
    ref = decode_oracle(jax.tree.map(np.asarray, params), cfg, z)
    ref = ref.transpose(0, 2, 3, 4, 1)  # NCDHW -> (B, F, H, W, C)
    assert got_full.shape == ref.shape
    np.testing.assert_allclose(got_full, ref, atol=atol, rtol=1e-3)
    np.testing.assert_allclose(got_chunk, ref, atol=atol, rtol=1e-3)


def test_decode_matches_numpy_frame_cache_oracle_tiny(monkeypatch):
    """Vectorized + streaming decode == the literal torch chunk-walk
    (independent numpy port, tests/wan_vae_oracle.py), f32 vs f32."""
    _oracle_compare(TINY, (1, TINY.z_dim, 4, 4, 4), 23, monkeypatch, 2e-3)


def test_decode_matches_oracle_real_channel_structure(monkeypatch):
    """Same oracle at the REAL Wan2.1 channel law (base 96, z 16, mult
    (1,2,4,4), 2 res blocks) — the config real checkpoints ship; spatial
    dims kept tiny for the 1-core CPU oracle."""
    cfg = WanVAEConfig(base_dim=96, z_dim=16, dim_mult=(1, 2, 4, 4),
                       num_res_blocks=2,
                       temporal_downsample=(False, True, True))
    _oracle_compare(cfg, (1, 16, 3, 2, 2), 29, monkeypatch, 5e-3)


# ---------------------------------------------------- Wan2.2 residual variant

RES_TINY = WanVAEConfig(
    base_dim=8, z_dim=4, dim_mult=(1, 2, 4, 4), num_res_blocks=1,
    temporal_downsample=(False, True, True), is_residual=True)


def _mk_residual_state_dict(cfg: WanVAEConfig):
    """Synthetic Wan2.2 (is_residual) state dict: NESTED
    down_blocks.{i}.resnets/.downsampler and up_blocks.{i}.resnets/.upsampler
    module layout; upsample convs keep channels; shortcuts parameter-free."""
    rng = np.random.default_rng(7)
    sd = {}

    def conv3d(name, cin, cout, kt=3, kh=3, kw=3):
        sd[f"{name}.weight"] = rng.standard_normal(
            (cout, cin, kt, kh, kw)).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = np.zeros((cout,), np.float32)

    def conv2d(name, cin, cout, k=3):
        sd[f"{name}.weight"] = rng.standard_normal(
            (cout, cin, k, k)).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = np.zeros((cout,), np.float32)

    def norm(name, c):
        sd[f"{name}.gamma"] = np.ones((c, 1, 1, 1), np.float32)

    def res(name, cin, cout):
        norm(f"{name}.norm1", cin)
        conv3d(f"{name}.conv1", cin, cout)
        norm(f"{name}.norm2", cout)
        conv3d(f"{name}.conv2", cout, cout)
        if cin != cout:
            conv3d(f"{name}.conv_shortcut", cin, cout, 1, 1, 1)

    def attn(name, c):
        norm(f"{name}.norm", c)
        for nm, co in (("to_qkv", 3 * c), ("proj", c)):
            sd[f"{name}.{nm}.weight"] = rng.standard_normal(
                (co, c, 1, 1)).astype(np.float32) * 0.02
            sd[f"{name}.{nm}.bias"] = np.zeros((co,), np.float32)

    def mid(name, c):
        res(f"{name}.resnets.0", c, c)
        attn(f"{name}.attentions.0", c)
        res(f"{name}.resnets.1", c, c)

    n = len(cfg.dim_mult)
    e = cfg.encoder_dims
    pix = 3 * cfg.patch_size**2
    conv3d("encoder.conv_in", pix, e[0])
    for i in range(n):
        cin, cout = e[i], e[i + 1]
        b = f"encoder.down_blocks.{i}"
        for j in range(cfg.num_res_blocks):
            res(f"{b}.resnets.{j}", cin if j == 0 else cout, cout)
        if i != n - 1:
            conv2d(f"{b}.downsampler.resample.1", cout, cout)
            if cfg.temporal_downsample[i]:
                conv3d(f"{b}.downsampler.time_conv", cout, cout, 3, 1, 1)
    mid("encoder.mid_block", e[-1])
    norm("encoder.norm_out", e[-1])
    conv3d("encoder.conv_out", e[-1], 2 * cfg.z_dim)
    conv3d("quant_conv", 2 * cfg.z_dim, 2 * cfg.z_dim, 1, 1, 1)

    d = cfg.decoder_dims
    t_up = tuple(reversed(cfg.temporal_downsample))
    conv3d("decoder.conv_in", cfg.z_dim, d[0])
    mid("decoder.mid_block", d[0])
    for i in range(n):
        cin, cout = d[i], d[i + 1]
        b = f"decoder.up_blocks.{i}"
        for j in range(cfg.num_res_blocks + 1):
            res(f"{b}.resnets.{j}", cin if j == 0 else cout, cout)
        if i != n - 1:
            if t_up[i]:
                conv3d(f"{b}.upsampler.time_conv", cout, 2 * cout, 3, 1, 1)
            conv2d(f"{b}.upsampler.resample.1", cout, cout)
    norm("decoder.norm_out", d[-1])
    conv3d("decoder.conv_out", d[-1], pix)
    conv3d("post_quant_conv", cfg.z_dim, cfg.z_dim, 1, 1, 1)
    return sd


def test_residual_loader_consumes_nested_layout():
    params = wan_vae_load(TensorSource(_mk_residual_state_dict(RES_TINY)),
                          RES_TINY)
    # upsample convs keep channels in the residual layout
    up0 = params["decoder"]["up"][0]["upsample"]["w"]
    assert up0.shape[-2] == up0.shape[-1]


def test_residual_decode_frame_law_and_roundtrip():
    params = wan_vae_load(TensorSource(_mk_residual_state_dict(RES_TINY)),
                          RES_TINY)
    z = jnp.asarray(np.random.default_rng(11).standard_normal(
        (1, RES_TINY.z_dim, 3, 4, 4)), jnp.float32)
    out = np.asarray(wan_vae_decode(params, RES_TINY, z))
    assert out.shape == (1, 9, 32, 32, 3)  # 1 + 4(F-1), 8x spatial
    assert np.isfinite(out).all()
    vid = jnp.asarray(np.random.default_rng(12).standard_normal(
        (1, 9, 32, 32, 3)), jnp.float32)
    lat = np.asarray(wan_vae_encode(params, RES_TINY, vid))
    assert lat.shape == (1, RES_TINY.z_dim, 3, 4, 4)
    assert np.isfinite(lat).all()


def test_residual_chunked_decode_matches_full():
    from fastdm_tpu.pipeline.wan_vae import wan_vae_decode_chunked

    params = wan_vae_load(TensorSource(_mk_residual_state_dict(RES_TINY)),
                          RES_TINY)
    z = jnp.asarray(np.random.default_rng(13).standard_normal(
        (1, RES_TINY.z_dim, 4, 4, 4)), jnp.float32)
    full = np.asarray(wan_vae_decode(params, RES_TINY, z))
    chunked = np.asarray(wan_vae_decode_chunked(params, RES_TINY, z))
    assert chunked.shape == full.shape
    d = np.abs(chunked - full)
    assert d.max() < 0.12 and d.mean() < 0.01


def test_residual_decode_matches_oracle(monkeypatch):
    """Residual decode (DupUp3D shortcuts, channel-keeping upsample convs)
    == the independent numpy chunk-walk oracle, f32 vs f32."""
    _oracle_compare(RES_TINY, (1, RES_TINY.z_dim, 4, 4, 4), 31, monkeypatch,
                    2e-3)
