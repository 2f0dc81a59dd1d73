"""FastDMEngine — the end-user engine (ref: fastdm/model_entry.py:529-834).

API-compatible constructor flags (`use_fp8`/`use_int8`, `kernel_backend`,
`cache_config`, `sparse_attn_config`, `oom_resolve`) and `.generate()` kwargs.
Differences by design:
  * the denoise loop is owned (one jit, SURVEY.md §7) instead of delegating to
    diffusers;
  * `oom_resolve` is a no-op accepted for CLI parity — text encoders always
    run host-side (see pipeline/text_encoder.py), which is the TPU-native
    equivalent;
  * compiled denoisers are memoized per (resolution, steps, guidance) — the
    reference's warmup-run convention (examples/demo/gen.py) maps to
    first-call compilation here.

Architectures: flux (t2i), sd35 (t2i), sdxl (t2i), qwen-image (t2i),
wan2.2-t2v / -i2v / -ti2v (t2v/i2v; A14B dual expert via transformer_2).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fastdm_tpu.caching.xcaching import AutoCache
from fastdm_tpu.kernels import set_global_backend
from fastdm_tpu.models.loader import TensorSource
from fastdm_tpu.pipeline.schedulers import (
    EulerDiscreteScheduler,
    FlowMatchEulerScheduler,
    UniPCMultistepScheduler,
    flow_match_shift_mu,
)
from fastdm_tpu.pipeline.vae import VAEConfig, vae_decode, vae_encode, vae_load

# Long-video HBM capacity thresholds (token counts at which _generate_wan
# auto-enables FFN token-chunking / the split-QKV projection; module-level
# so tests can exercise the auto-derivation at tiny shapes).
_FFN_CHUNK_MIN_TOKENS = 30000
_SPLIT_QKV_MIN_TOKENS = 60000

ARCH_ALIASES = {
    "flux": "flux", "flux-dev": "flux", "flux-krea": "flux", "flux-kontext": "flux",
    "sd35": "sd35", "sd3.5": "sd35",
    "sdxl": "sdxl",
    "qwen-image": "qwen", "qwen-image-edit": "qwen",
    "wan2.2-t2v": "wan", "wan2.2-i2v": "wan", "wan2.2-ti2v": "wan",
    # wan2.1 checkpoints load through the same core; 2.1-i2v additionally
    # carries the CLIP image-conditioning branch (image_encoder subdir)
    "wan": "wan", "wan-i2v": "wan", "wan2.1-t2v": "wan", "wan2.1-i2v": "wan",
}

# per-model VAE configs (diffusers AutoencoderKL variants)
VAE_CONFIGS = {
    "flux": VAEConfig(latent_channels=16, scaling_factor=0.3611, shift_factor=0.1159),
    "sd35": VAEConfig(latent_channels=16, scaling_factor=1.5305, shift_factor=0.0609),
    "sdxl": VAEConfig(latent_channels=4, scaling_factor=0.13025, shift_factor=0.0),
    "qwen": VAEConfig(latent_channels=16, scaling_factor=1.0, shift_factor=0.0),
}


def _read_json(path):
    with open(path, "r", encoding="utf-8") as f:
        return json.load(f)


def _resize_to_multiple(img: np.ndarray, m: int) -> np.ndarray:
    """Resize an HWC uint8 image down to side lengths divisible by m (the
    VAE/patchify granularity) — diffusers' edit pipelines do the same
    normalization before encoding."""
    h, w = img.shape[0], img.shape[1]
    nh, nw = max(m, h // m * m), max(m, w // m * m)
    if (nh, nw) == (h, w):
        return img
    try:
        from PIL import Image

        return np.asarray(Image.fromarray(img).resize((nw, nh), Image.LANCZOS))
    except ImportError:  # no-PIL fallback: center-crop, edge-pad if smaller
        if nh > h or nw > w:
            img = np.pad(img, ((0, max(0, nh - h)), (0, max(0, nw - w)), (0, 0)),
                         mode="edge")
            h, w = img.shape[0], img.shape[1]
        top, left = (h - nh) // 2, (w - nw) // 2
        return img[top:top + nh, left:left + nw]


class FastDMEngine:
    def __init__(
        self,
        model_path: str,
        architecture: str = "flux",
        use_fp8: bool = False,
        use_int8: bool = False,
        use_int4: bool = False,  # W4A4 + SVDQuant low-rank (TPU extension)
        pack_int4: bool = False,  # int4 capacity form: 0.5 byte/param in HBM
        kernel_backend: str = "auto",
        cache_config: Optional[str | Dict[str, Any]] = None,
        sparse_attn_config: Optional[str | Dict[str, Any]] = None,
        oom_resolve: bool = False,  # accepted for parity; host text-encode is default
        max_sequence_length: int = 512,
        quant_mods: bool = False,
        mesh_shape: Optional[tuple] = None,  # (dp, sp, tp) or (dp, sp, tp, pp)
        controlnet_path: Optional[str] = None,  # flux/sdxl CN checkpoint dir
        ip_adapter_path: Optional[str] = None,  # sdxl IP-Adapter checkpoint
        ip_adapter_scale: float = 0.6,
        vae_tiling: bool = False,   # diffusers enable_vae_tiling parity
        vae_slicing: bool = False,  # diffusers enable_vae_slicing parity
        scheduler: Optional[str] = None,  # None=per-family default; "unipc"|"euler"
        offload_inactive_expert: bool = False,  # A14B: host-resident experts
        snapshot_path: Optional[str] = None,  # quantized-snapshot cache dir
        verbose: bool = True,
    ):
        self.vae_tiling = vae_tiling
        self.vae_slicing = vae_slicing
        self.offload_inactive_expert = offload_inactive_expert
        # set by the wan loader in offload mode; upgraded by the mesh block
        self._place_params = None
        if scheduler not in (None, "unipc", "euler"):
            raise ValueError(f"scheduler must be 'unipc' or 'euler', got {scheduler!r}")
        self.scheduler_name = scheduler
        arch = ARCH_ALIASES.get(architecture)
        if arch is None:
            raise ValueError(f"unknown architecture {architecture!r}")
        if scheduler is not None and arch != "wan":
            # only the wan loop reads scheduler_name — reject rather than
            # silently running the family's fixed scheduler
            raise ValueError(
                f"scheduler={scheduler!r} is only supported for wan; "
                f"{arch} uses its fixed per-family scheduler")
        self.architecture = arch
        self.architecture_full = architecture
        self.model_path = model_path
        set_global_backend(kernel_backend)
        if sum((use_fp8, use_int8, use_int4)) > 1:
            raise ValueError("use_fp8 / use_int8 / use_int4 are mutually exclusive")
        if mesh_shape is not None:
            if len(mesh_shape) not in (3, 4):
                raise ValueError(
                    f"mesh_shape must be (dp, sp, tp) or (dp, sp, tp, pp), "
                    f"got {mesh_shape}")
            if len(mesh_shape) == 4 and mesh_shape[3] > 1:
                # PP is the weights-don't-fit axis; composing it with tp/sp
                # inside one shard_map needs manual collectives in the block
                # fns (future work) — reject rather than silently waste chips
                if mesh_shape[1] != 1 or mesh_shape[2] != 1:
                    raise ValueError(
                        "pp > 1 requires sp == 1 and tp == 1 "
                        f"(got mesh_shape={mesh_shape}); compose pp with dp only")
                if arch not in ("flux", "wan", "qwen"):
                    # PP is the weights-don't-fit axis; flux/wan/qwen route
                    # their stacks through the GPipe schedule. sd35/sdxl fit
                    # any chip and have NO pp routing — a pp-sharded stack
                    # consumed by their sequential scans would make GSPMD
                    # gather full weights per chip (the exact OOM pp is
                    # bought to avoid). Reject rather than silently degrade.
                    raise ValueError(
                        f"pp > 1 is not supported for architecture={arch!r} "
                        "(PP block routing exists for flux/wan/qwen only)")
                if controlnet_path is not None:
                    # per-layer CN residuals carry a per-microbatch batch dim
                    # the layer-stacked GPipe feed can't (models/flux.py
                    # _pp_applicable) — the scan fallback would gather the
                    # pp-sharded stacks
                    raise ValueError("pp > 1 is incompatible with controlnet_path")
        if pack_int4 and not use_int4:
            raise ValueError("pack_int4 requires use_int4")
        quant = "fp8" if use_fp8 else ("int8" if use_int8 else
                                       (("int4p" if pack_int4 else "int4")
                                        if use_int4 else None))
        self.quant = quant

        t0 = time.perf_counter()

        from fastdm_tpu.utils.profiling import enable_compilation_cache

        enable_compilation_cache()

        self.cache = None
        if cache_config is not None:
            self.cache = (
                AutoCache.from_json(cache_config)
                if isinstance(cache_config, str)
                else AutoCache.from_dict(cache_config)
            )
        if (mesh_shape is not None and len(mesh_shape) == 4
                and mesh_shape[3] > 1 and self.cache is not None
                and self.cache.config.enable_caching
                and self.cache.config.cache_algorithm
                in ("fbcache", "dicache")):
            # probe-prefix caches run the first block(s) standalone and then
            # call the block runners with start_dual/start_block > 0 — that
            # prefix split bypasses the GPipe route, so the sequential scan
            # over pp-sharded stacks would make GSPMD gather full weights per
            # chip every non-skipped step (the exact OOM pp is bought to
            # avoid). TeaCache probes the modulated input only and replays
            # the FULL stack, so it composes with GPipe fine. (ADVICE r3)
            raise ValueError(
                f"pp > 1 is incompatible with cache_algorithm="
                f"{self.cache.config.cache_algorithm!r} (probe-prefix caches "
                "bypass the GPipe block routing); use teacache or disable "
                "caching")
        self.sparse_attn = None
        if sparse_attn_config is not None:
            from fastdm_tpu.sparse.xsparse import SparseAttn

            self.sparse_attn = (
                SparseAttn.from_json(sparse_attn_config)
                if isinstance(sparse_attn_config, str)
                else SparseAttn.from_dict(sparse_attn_config)
            )

        # quantized-snapshot cache (TPU extension, models/snapshot.py): when
        # snapshot_path holds a snapshot, the denoiser params load from it
        # directly (mmap -> device copy, no parsing/fusion/quantization);
        # when it is set but empty, the freshly quantized trees are written
        # there so the NEXT engine start skips the quantization work
        self.snapshot_path = snapshot_path
        self._snapshot_pending: Dict[str, Any] = {}
        self._loaded_trees: Dict[str, Any] = {}
        self._snapshot_manifest = None

        init = getattr(self, f"_init_{arch}")
        init(quant, quant_mods, max_sequence_length)
        # snapshot-manifest cfg is pinned HERE: this is the cfg the load-side
        # check_compatible sees (inside _load_tree, before the ip-adapter
        # replace below and before generate()'s runtime sparse-field tuning)
        self._manifest_cfg = self.cfg

        if snapshot_path and self._snapshot_pending:
            self.save_quantized(snapshot_path)
            self._snapshot_pending = {}

        # optional ControlNet (ref: sdxl_controlnet / flux_controlnet wrappers,
        # model_entry.py:471-472); generate() then accepts control_image=...
        self.cn_params = self.cn_cfg = None
        if controlnet_path is not None:
            self._load_controlnet(controlnet_path)

        # optional SDXL IP-Adapter (ref: is_ip_adapter wrapper flag,
        # model_entry.py + SDXLUNetModelCore encoder_hid_proj, sdxl.py:114-137);
        # generate() then accepts ip_adapter_image=...
        self.ip_proj = None
        if ip_adapter_path is not None:
            if arch != "sdxl":
                raise ValueError("ip_adapter_path is supported for sdxl only")
            import dataclasses as _dc

            from fastdm_tpu.models.sdxl import sdxl_attach_ip_adapter
            from fastdm_tpu.pipeline.text_encoder import CLIPImageEncoder

            self.cfg = _dc.replace(self.cfg, ip_adapter_scale=ip_adapter_scale)
            self.ip_proj = sdxl_attach_ip_adapter(
                self.params, TensorSource.from_path(ip_adapter_path), self.cfg
            )
            self.image_encoder = CLIPImageEncoder(
                os.path.join(self.model_path, "image_encoder")
            )

        # multi-chip: TP/SP-shard the denoiser weights over a named mesh
        # (new surface vs the single-GPU reference, SURVEY.md §2.7)
        self.mesh = None
        if mesh_shape is not None:
            from jax.sharding import Mesh

            from fastdm_tpu.parallel.mesh import AXES, shard_params_by_name

            axes = AXES if len(mesh_shape) == 3 else AXES + ("pp",)
            n = int(np.prod(mesh_shape))
            devs = np.asarray(jax.devices()[:n]).reshape(mesh_shape)
            self.mesh = Mesh(devs, axes)
            if self.mesh.shape.get("sp", 1) > 1:
                # long-sequence scale-out: dense attention becomes a ring over
                # the sp axis (the Wan 81f/720p design case, BENCH_NOTES.md).
                # Routing is scoped per generate() call (see generate()) so a
                # second, unsharded engine in the same process is unaffected.
                from fastdm_tpu.parallel import context_parallel  # noqa: F401

                if self.sparse_attn is not None:
                    # the block-sparse pallas kernel is single-chip; under sp
                    # the ring already scales attention ~1/sp — combining the
                    # two is future work, dense-ring wins here
                    print("sparse_attn_config ignored with sp > 1 "
                          "(ring attention handles the long sequence)")
                    self.sparse_attn = None
            if self.mesh.shape.get("pp", 1) > 1:
                if (self.sparse_attn is not None
                        and self.sparse_attn.config.dense_layers > 0):
                    # dense_layers splits the wan stack into two segments;
                    # wan_run_blocks only routes the UNIFORM stack through
                    # GPipe — the split stack would fall back to a scan over
                    # pp-sharded weights (full gather per chip)
                    raise ValueError(
                        "pp > 1 requires sparse dense_layers == 0 "
                        f"(got {self.sparse_attn.config.dense_layers}); the "
                        "split stack has no GPipe routing")
                # PP placement: block stacks sharded over the layer axis
                # (each stage holds only its own L/pp layers)
                from fastdm_tpu.parallel.pipeline import shard_model_stacks_pp

                place = lambda p, _m=self.mesh: shard_model_stacks_pp(p, _m)
            else:
                place = lambda p, _m=self.mesh: shard_params_by_name(p, _m)
            if getattr(self, "_place_params", None) is not None:
                # offload + mesh composition: both experts stay in HOST RAM
                # and the phase denoiser places the ACTIVE one straight onto
                # its tp shards (offload + tp=2 is the minimal A14B slice —
                # BENCH_NOTES residency math)
                self._place_params = place
            else:
                self.params = place(self.params)
                if getattr(self, "params_2", None) is not None:
                    self.params_2 = place(self.params_2)
            if self.cn_params is not None:
                self.cn_params = place(self.cn_params)

        self._denoisers: Dict[tuple, Any] = {}
        self._denoiser_sigmas_by_key: Dict[tuple, Any] = {}
        self.verbose = verbose
        # on-device cache skip count of the most recent generate() (parity
        # with the reference's per-step cache-skip prints, SURVEY.md 5.5)
        self.last_cache_skips = 0
        if verbose:
            print(
                f"FastDMEngine[{architecture}] loaded in {time.perf_counter() - t0:.1f}s "
                f"(quant={quant}, backend={kernel_backend})"
            )

    # ------------------------------------------------------------ loaders

    def _load_tree(self, name: str, build_fn):
        """Load the param tree `name` from the snapshot when one exists at
        snapshot_path (validated against this engine's arch/quant/config);
        otherwise build it from the diffusers checkpoint via build_fn and
        queue it for snapshot writing (see __init__)."""
        from fastdm_tpu.models import snapshot as snap

        sp = self.snapshot_path
        if sp and snap.is_snapshot(sp):
            if self._snapshot_manifest is None:
                self._snapshot_manifest = snap.load_manifest(sp)
                snap.check_compatible(
                    self._snapshot_manifest,
                    architecture=self.architecture_full,
                    quant=self.quant, cfg=self.cfg)
                extra = self._snapshot_manifest.get("extra", {})
                base = extra.get("model_path")
                want = extra.get("source_files")
                if want is not None:
                    # weight-provenance gate: the manifest records the source
                    # checkpoint's weight files (relpath/size/mtime); a
                    # snapshot built from different weights — or a checkpoint
                    # updated in place at the same path — must raise, not
                    # silently serve stale arrays (ADVICE r3)
                    have = snap.source_fingerprint(self.model_path)
                    if (have != want and os.environ.get(
                            "FASTDM_SNAPSHOT_ALLOW_MISMATCH") != "1"):
                        raise ValueError(
                            f"snapshot {sp} was built from a checkpoint whose "
                            f"weight files differ from {self.model_path!r} "
                            f"(built from {base!r}); delete the snapshot dir "
                            "to rebuild it, or set "
                            "FASTDM_SNAPSHOT_ALLOW_MISMATCH=1 if the weights "
                            "are known-identical")
                elif base and os.path.realpath(base) != os.path.realpath(self.model_path):
                    # pre-fingerprint snapshot: provenance unknown — warn only
                    print(f"snapshot {sp} was built from {base!r}; "
                          f"serving it for model_path={self.model_path!r} — "
                          "delete the snapshot dir if the weights differ")
            tree = snap.load_tree(sp, name, self._snapshot_manifest)
            self._loaded_trees[name] = tree
            return tree
        if os.environ.get("FASTDM_LOAD_ON_HOST") == "1":
            # Build the quantized tree on the CPU backend, then move it in
            # ONE batched device_put. At 20+ GiB checkpoint scale the
            # per-tensor on-device build dies: the allocator reclaims
            # transfer/quantize transients lazily and hundreds of individual
            # h2d transfers accumulate device garbage past HBM (the
            # full-scale FLUX parity load RESOURCE_EXHAUSTED, 2026-08-21);
            # a single tree transfer is also much faster over the tunnel.
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                tree = build_fn()
                jax.block_until_ready(tree)
            # chunked transfer: one device_put of an 11+ GiB tree OOMs over
            # the tunnel (staging ~2x the payload on device); ~2 GiB groups
            # with a barrier between them stay well under HBM
            leaves, treedef = jax.tree_util.tree_flatten(tree)
            dev = jax.devices()[0]

            def _flush():
                # a COMPUTE round trip, not just block_until_ready: transfer
                # staging frees are deferred until the next Execute on this
                # tunnel (same reclamation behavior as the A14B expert swap,
                # BENCH_NOTES 2026-08-21)
                np.asarray(jax.jit(lambda: jnp.zeros((), jnp.int32))())

            out, group, gbytes = [], [], 0
            for leaf in leaves:
                group.append(leaf)
                gbytes += leaf.size * leaf.dtype.itemsize
                if gbytes >= 2 << 30:
                    moved = jax.device_put(group, dev)
                    jax.block_until_ready(moved)
                    out.extend(moved)
                    group, gbytes = [], 0
                    _flush()
            if group:
                moved = jax.device_put(group, dev)
                jax.block_until_ready(moved)
                out.extend(moved)
                _flush()
            tree = jax.tree_util.tree_unflatten(treedef, out)
        else:
            tree = build_fn()
        self._loaded_trees[name] = tree
        if sp:
            self._snapshot_pending[name] = tree
        return tree

    def save_quantized(self, dir_path: str) -> None:
        """Write the loaded (already-quantized) denoiser param trees as a
        snapshot; a later FastDMEngine(..., snapshot_path=dir_path) skips
        checkpoint parsing + fusion + quantization entirely."""
        from fastdm_tpu.models import snapshot as snap

        trees = dict(self._loaded_trees)
        snap.save_snapshot(
            dir_path, trees,
            architecture=self.architecture_full, quant=self.quant,
            # init-time cfg: generate() runtime-tunes sparse-gather fields via
            # dataclasses.replace on self.cfg; baking the mutated cfg would
            # make the snapshot fail check_compatible on the next engine
            # start even though the weights are identical (ADVICE r3)
            cfg=getattr(self, "_manifest_cfg", self.cfg),
            extra={"model_path": self.model_path,
                   "source_files": snap.source_fingerprint(self.model_path)})
        if getattr(self, "verbose", True):
            print(f"quantized snapshot written to {dir_path} "
                  f"({', '.join(sorted(trees))})")

    def _load_controlnet(self, path: str):
        if self.architecture == "flux":
            from fastdm_tpu.models.controlnets import (
                FluxControlNetConfig, flux_controlnet_load,
            )

            cn_json = {}
            cfg_file = os.path.join(path, "config.json")
            if os.path.exists(cfg_file):
                cn_json = _read_json(cfg_file)
            kw = {
                k: cn_json[k]
                for k in ("num_layers", "num_single_layers", "guidance_embeds",
                          "patch_size", "in_channels", "out_channels",
                          "attention_head_dim", "num_attention_heads",
                          "joint_attention_dim", "pooled_projection_dim")
                if cn_json.get(k) is not None
            }
            if cn_json.get("axes_dims_rope") is not None:
                kw["axes_dims_rope"] = tuple(cn_json["axes_dims_rope"])
            kw.setdefault("num_layers", 5)
            kw.setdefault("num_single_layers", 0)
            kw.setdefault("guidance_embeds", False)
            self.cn_cfg = FluxControlNetConfig(quant=self.quant, **kw)
            self.cn_params = flux_controlnet_load(TensorSource.from_path(path), self.cn_cfg)
        elif self.architecture == "sdxl":
            from fastdm_tpu.models.controlnets import sdxl_controlnet_load

            self.cn_cfg = self.cfg
            self.cn_params = sdxl_controlnet_load(TensorSource.from_path(path), self.cfg)
        else:
            raise ValueError(
                f"ControlNet is supported for flux/sdxl, not {self.architecture}"
            )

    def _load_vae(self, kind: str):
        if kind == "qwen":
            # real Qwen-Image ships AutoencoderKLQwenImage — a Wan-derived 3D
            # causal VAE (base_dim/temperal_downsample/latents_mean in its
            # config.json), NOT a 2D AutoencoderKL. Detect and route; 2D
            # stays for AutoencoderKL-style checkpoints (and synthetic tests)
            cfg_path = os.path.join(self.model_path, "vae", "config.json")
            if os.path.exists(cfg_path) and "base_dim" in _read_json(cfg_path):
                self._load_vae_wan_style()
                return
        # vae/config.json overrides the per-family defaults when present —
        # diffusers checkpoints always ship one, and variant VAEs (or the
        # synthetic full-scale gate's placeholder) would otherwise hit shape
        # mismatches against the hardcoded VAE_CONFIGS constants
        vae_kw = self._cfg_overrides(
            "vae", ("latent_channels", "layers_per_block", "norm_num_groups",
                    "scaling_factor", "shift_factor",
                    "mid_block_add_attention"),
            {"block_out_channels": lambda v: {
                "block_out_channels": tuple(v)}},
        )
        self.vae_cfg = dataclasses.replace(VAE_CONFIGS[kind], **vae_kw)
        self.vae_params = vae_load(
            TensorSource.from_path(os.path.join(self.model_path, "vae")), self.vae_cfg
        )
        self._bind_vae_fns()

    def _load_vae_wan_style(self):
        """Qwen's 3D VAE: wan_vae_* with a singleton frame axis around the
        2D image contract (decode (B,C,h,w)->(B,H,W,3); encode the reverse).
        The wan codecs apply latents_mean/std internally."""
        from fastdm_tpu.pipeline.wan_vae import (
            WanVAEConfig, wan_vae_decode, wan_vae_encode, wan_vae_load,
        )

        vae_kw = self._cfg_overrides(
            "vae", ("base_dim", "z_dim", "num_res_blocks", "patch_size",
                    "is_residual"),
            {
                "latents_mean": lambda v: {"latents_mean": tuple(v)},
                "latents_std": lambda v: {"latents_std": tuple(v)},
                "dim_mult": lambda v: {"dim_mult": tuple(v)},
                "temperal_downsample": lambda v: {
                    "temporal_downsample": tuple(v)},
            },
        )
        self.vae_cfg = WanVAEConfig(**vae_kw)
        self.vae_params = wan_vae_load(
            TensorSource.from_path(os.path.join(self.model_path, "vae")),
            self.vae_cfg,
        )
        if self.vae_tiling or self.vae_slicing:
            print("warning: vae tiling/slicing not supported on the 3D "
                  "(qwen/wan) VAE path; running full-frame")
        self._decode = jax.jit(
            lambda p, z: wan_vae_decode(p, self.vae_cfg, z[:, :, None])[:, 0]
        )
        self._encode = jax.jit(
            lambda p, x: wan_vae_encode(p, self.vae_cfg, x[:, None])[:, :, 0]
        )

    def _bind_vae_fns(self):
        """Pick the decode/encode strategy from the tiling/slicing flags
        (diffusers enable_vae_tiling/enable_vae_slicing parity — the reference
        inherits these from the pipeline; here they are engine state)."""
        from fastdm_tpu.pipeline.vae import (
            vae_decode_sliced, vae_decode_tiled, vae_encode_tiled,
        )

        if self.vae_tiling:
            self._decode = lambda p, z: vae_decode_tiled(p, self.vae_cfg, z)
        elif self.vae_slicing:
            self._decode = lambda p, z: vae_decode_sliced(p, self.vae_cfg, z)
        else:
            self._decode = jax.jit(lambda p, z: vae_decode(p, self.vae_cfg, z))

        def _enc_params(p):
            if "encoder" not in p:
                raise ValueError(
                    "this VAE checkpoint has no encoder weights — i2i/edit "
                    "tasks need the full AutoencoderKL, not a decoder-only one"
                )
            return p["encoder"]

        if self.vae_tiling:
            self._encode = lambda p, x: vae_encode_tiled(
                _enc_params(p), self.vae_cfg, x
            )
        else:
            self._encode = jax.jit(
                lambda p, x: vae_encode(_enc_params(p), self.vae_cfg, x)
            )

    def enable_vae_tiling(self):
        self.vae_tiling = True
        self._bind_vae_fns()

    def disable_vae_tiling(self):
        self.vae_tiling = False
        self._bind_vae_fns()

    def enable_vae_slicing(self):
        self.vae_slicing = True
        self._bind_vae_fns()

    def disable_vae_slicing(self):
        self.vae_slicing = False
        self._bind_vae_fns()

    def _cfg_overrides(self, subdir: str, keys, transforms=None):
        """Model hyperparams from the HF config.json when present — covers
        checkpoint variants (flux-schnell guidance_embeds=False, sd3.5-large
        38 layers, ...) without new engine flags (ref: the reference reads
        hf configs in its wrappers, model_entry.py:316-330,679)."""
        p = os.path.join(self.model_path, subdir, "config.json")
        if not os.path.exists(p):
            return {}
        cj = _read_json(p)
        out = {}
        for k in keys:
            if cj.get(k) is not None:
                out[k] = cj[k]
        for k, fn in (transforms or {}).items():
            if cj.get(k) is not None:
                out.update(fn(cj[k]))
        return out

    def _init_flux(self, quant, quant_mods, max_seq):
        from fastdm_tpu.models.flux import FluxConfig, flux_load
        from fastdm_tpu.pipeline.text_encoder import FluxTextEncoder

        kw = self._cfg_overrides(
            "transformer",
            ("patch_size", "in_channels", "out_channels", "num_layers",
             "num_single_layers", "attention_head_dim", "num_attention_heads",
             "joint_attention_dim", "pooled_projection_dim", "guidance_embeds"),
            {"axes_dims_rope": lambda v: {"axes_dims_rope": tuple(v)}},
        )
        self.cfg = FluxConfig(quant=quant, quant_mods=quant_mods, **kw)
        self.params = self._load_tree("transformer", lambda: flux_load(
            TensorSource.from_path(os.path.join(self.model_path, "transformer")), self.cfg
        ))
        self._load_vae("flux")
        self.text_encoder = FluxTextEncoder(self.model_path, max_seq)

    def _init_sd35(self, quant, quant_mods, max_seq):
        from fastdm_tpu.models.sd35 import SD3Config, sd3_load
        from fastdm_tpu.pipeline.text_encoder import SD3TextEncoder

        kw = self._cfg_overrides(
            "transformer",
            ("sample_size", "patch_size", "in_channels", "out_channels",
             "num_layers", "attention_head_dim", "num_attention_heads",
             "joint_attention_dim", "caption_projection_dim",
             "pooled_projection_dim", "pos_embed_max_size"),
            {"dual_attention_layers":
                 lambda v: {"num_dual_layers": len(v)}},
        )
        self.cfg = SD3Config(quant=quant, **kw)
        self.params = self._load_tree("transformer", lambda: sd3_load(
            TensorSource.from_path(os.path.join(self.model_path, "transformer")), self.cfg
        ))
        self._load_vae("sd35")
        self.text_encoder = SD3TextEncoder(self.model_path)

    def _init_sdxl(self, quant, quant_mods, max_seq):
        from fastdm_tpu.models.sdxl import SDXLConfig, sdxl_load
        from fastdm_tpu.pipeline.text_encoder import SDXLTextEncoder

        self.cfg = SDXLConfig(quant=quant)
        self.params = self._load_tree("unet", lambda: sdxl_load(
            TensorSource.from_path(os.path.join(self.model_path, "unet")), self.cfg
        ))
        self._load_vae("sdxl")
        self.text_encoder = SDXLTextEncoder(self.model_path)

    def _init_qwen(self, quant, quant_mods, max_seq):
        from fastdm_tpu.models.qwenimage import QwenImageConfig, qwen_load
        from fastdm_tpu.pipeline.text_encoder import QwenImageTextEncoder

        kw = self._cfg_overrides(
            "transformer",
            ("patch_size", "in_channels", "out_channels", "num_layers",
             "attention_head_dim", "num_attention_heads", "joint_attention_dim"),
            {"axes_dims_rope": lambda v: {"axes_dims_rope": tuple(v)}},
        )
        self.cfg = QwenImageConfig(quant=quant, quant_mods=quant_mods, **kw)
        self.params = self._load_tree("transformer", lambda: qwen_load(
            TensorSource.from_path(os.path.join(self.model_path, "transformer")), self.cfg
        ))
        self._load_vae("qwen")
        self.text_encoder = QwenImageTextEncoder(self.model_path)

    def _init_wan(self, quant, quant_mods, max_seq):
        from fastdm_tpu.models.wan import WanConfig, wan_load
        from fastdm_tpu.pipeline.text_encoder import WanTextEncoder

        # model hyperparams from the HF config.json (ref: model_entry.py:679)
        cfg_json = _read_json(os.path.join(self.model_path, "transformer", "config.json"))
        dense_layers = self.sparse_attn.config.dense_layers if self.sparse_attn else 0
        self.cfg = WanConfig(
            patch_size=tuple(cfg_json.get("patch_size", (1, 2, 2))),
            num_attention_heads=cfg_json.get("num_attention_heads", 40),
            attention_head_dim=cfg_json.get("attention_head_dim", 128),
            in_channels=cfg_json.get("in_channels", 16),
            out_channels=cfg_json.get("out_channels", 16),
            ffn_dim=cfg_json.get("ffn_dim", 13824),
            num_layers=cfg_json.get("num_layers", 40),
            freq_dim=cfg_json.get("freq_dim", 256),
            text_dim=cfg_json.get("text_dim", 4096),
            image_dim=cfg_json.get("image_dim"),
            added_kv_proj_dim=cfg_json.get("added_kv_proj_dim"),
            per_token_timestep=bool(cfg_json.get("pos_embed_seq_len")),
            dense_layers=dense_layers,
            quant=quant,
        )
        dual = os.path.isdir(os.path.join(self.model_path, "transformer_2"))
        offload = self.offload_inactive_expert and dual
        if offload:
            # explicit per-phase placer: the phase denoiser transfers the
            # ACTIVE expert and barriers at the phase boundary so device
            # peak stays one expert (mesh ctor upgrades this to a tp-shard
            # placer — offload composes with TP)
            # EXPLICIT target device: bare jax.device_put(x) keeps a
            # cpu-committed array on the CPU, so every branch call would
            # silently re-transfer the 7.25 GiB expert host->device (the
            # axon client leaks host staging per transfer AND the device
            # accumulates param copies until RESOURCE_EXHAUSTED — the r4/r5
            # A14B OOMs, doc/A14B_E2E_r4.log + /tmp probes 2026-08-21)
            self._place_params = lambda p: jax.device_put(
                p, jax.devices()[0])
            # EP residency (TPU answer to the reference's both-resident H20
            # load, ref: model_entry.py:673-690): both 14B experts stay in
            # HOST RAM; each phase jit of the phase-split denoiser
            # transfers only its own expert, so device peak is ONE expert
            # + activations (~11 GB int8 vs 21.5 GB both — BENCH_NOTES.md)
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                self.params = self._load_tree("transformer", lambda: wan_load(
                    TensorSource.from_path(
                        os.path.join(self.model_path, "transformer")), self.cfg
                ))
                self.params_2 = self._load_tree("transformer_2", lambda: wan_load(
                    TensorSource.from_path(
                        os.path.join(self.model_path, "transformer_2")),
                    self.cfg,
                ))
        else:
            self.params = self._load_tree("transformer", lambda: wan_load(
                TensorSource.from_path(os.path.join(self.model_path, "transformer")), self.cfg
            ))
            self.params_2 = None
            if dual:
                # A14B two-expert (ref: model_entry.py:673-690)
                self.params_2 = self._load_tree("transformer_2", lambda: wan_load(
                    TensorSource.from_path(os.path.join(self.model_path, "transformer_2")),
                    self.cfg,
                ))
        self.boundary_ratio = _read_json(
            os.path.join(self.model_path, "model_index.json")
        ).get("boundary_ratio") if os.path.exists(
            os.path.join(self.model_path, "model_index.json")
        ) else None
        self.text_encoder = WanTextEncoder(self.model_path, self.cfg.text_len)
        # Wan2.1-style I2V: the checkpoint ships a CLIP vision tower whose
        # penultimate-layer tokens condition cross-attention through the
        # image_embedder + add_k/add_v branch (diffusers
        # WanImageToVideoPipeline.encode_image; the reference rides that
        # pipeline, model_entry.py:617). wan2.2 i2v checkpoints have no
        # image_encoder and use channel-concat conditioning only.
        self.wan_image_encoder = None
        if "image_embedder" in self.params.get("condition_embedder", {}):
            from fastdm_tpu.pipeline.text_encoder import CLIPImageEncoder

            self.wan_image_encoder = CLIPImageEncoder(
                os.path.join(self.model_path, "image_encoder"))
        # Wan VAE (AutoencoderKLWan) is 3D — loaded separately; numerical
        # parity is unvalidated against real checkpoints, so any load failure
        # (incl. layout drift caught by the consumption assert) degrades to
        # latent-only output instead of breaking the engine
        from fastdm_tpu.pipeline.wan_vae import WanVAEConfig, wan_vae_load

        vae_kw = self._cfg_overrides(
            "vae", ("base_dim", "z_dim", "num_res_blocks", "patch_size",
                    "is_residual"),
            {
                "latents_mean": lambda v: {"latents_mean": tuple(v)},
                "latents_std": lambda v: {"latents_std": tuple(v)},
                "dim_mult": lambda v: {"dim_mult": tuple(v)},
                # diffusers spells it 'temperal_downsample'
                "temperal_downsample": lambda v: {"temporal_downsample": tuple(v)},
            },
        )
        self.vae_cfg = WanVAEConfig(**vae_kw)
        try:
            self.vae_params = wan_vae_load(
                TensorSource.from_path(os.path.join(self.model_path, "vae")), self.vae_cfg
            )
        except (NotImplementedError, FileNotFoundError, OSError, KeyError,
                AssertionError) as e:
            print(f"wan vae unavailable ({e!r}); generate() returns latents")
            self.vae_params = None

    # ------------------------------------------------------------ generate

    # reference kwarg spellings (ref: FastDMEngine.generate signature,
    # model_entry.py:719-731) accepted alongside the diffusers-style ones
    _GENERATE_ALIASES = {
        "steps": "num_inference_steps",
        "gen_seed": "seed",
        "gen_width": "width",
        "gen_height": "height",
        "src_image": "image",
        "max_seq_len": "max_sequence_length",
    }

    def generate(self, prompt=None, task: str = "t2i", **kw):
        """Dispatch per task/architecture (ref: FastDMEngine.generate,
        model_entry.py:719-834). Accepts both the reference's kwarg names
        (steps/gen_seed/gen_width/gen_height/src_image) and diffusers-style
        ones (num_inference_steps/seed/width/height/image)."""
        for ref_name, ours in self._GENERATE_ALIASES.items():
            if ref_name in kw:
                if ours in kw:
                    raise TypeError(
                        f"generate() got both {ref_name!r} and {ours!r}"
                    )
                kw[ours] = kw.pop(ref_name)
        # the reference engages i2i/i2v from src_image presence; mirror that
        if kw.get("image") is not None and task == "t2i":
            task = "i2v" if self.architecture == "wan" else "i2i"
        fn = getattr(self, f"_generate_{self.architecture}")
        # sequence-parallel attention routing and pipeline-parallel block
        # routing are active only while THIS engine generates (process-global
        # state saved/restored), so unsharded engines coexist in-process
        mesh = getattr(self, "mesh", None)
        sp_mesh = mesh if mesh is not None and mesh.shape.get("sp", 1) > 1 else None
        pp_mesh = mesh if mesh is not None and mesh.shape.get("pp", 1) > 1 else None
        if sp_mesh is None and pp_mesh is None:
            return fn(prompt, task=task, **kw)
        from fastdm_tpu.parallel import cp_state, pp_state

        prev_sp = cp_state.get_cp_mesh()
        prev_pp = pp_state.get_pp_mesh()
        if sp_mesh is not None:
            cp_state.set_cp_mesh(sp_mesh)
        if pp_mesh is not None:
            pp_state.set_pp_mesh(pp_mesh)
        try:
            return fn(prompt, task=task, **kw)
        finally:
            cp_state.set_cp_mesh(prev_sp)
            pp_state.set_pp_mesh(prev_pp)

    @property
    def _wan_sched_name(self) -> str:
        # Wan's default solver is UniPC: the reference rides diffusers'
        # WanPipeline, whose scheduler is UniPCMultistepScheduler
        # (ref: fastdm/model_entry.py:605-627); FlowMatch-Euler selectable
        return self.scheduler_name or "unipc"

    def _wan_scheduler(self, num_steps: int):
        if self._wan_sched_name == "unipc":
            return UniPCMultistepScheduler.create(num_steps, shift=5.0)
        return FlowMatchEulerScheduler.create(num_steps, shift=5.0)

    def _latents(self, shape, seed):
        lat = jax.random.normal(jax.random.key(seed), shape, jnp.float32)
        mesh = getattr(self, "mesh", None)
        if (mesh is not None and mesh.shape.get("dp", 1) > 1
                and shape[0] % mesh.shape["dp"] == 0):
            # data parallel: batch (num_images_per_prompt / CFG pairs) shards
            # over dp — the throughput axis the reference gets from one
            # process per GPU (SURVEY.md §2.7)
            from jax.sharding import NamedSharding, PartitionSpec as P

            spec = P(*(("dp",) + (None,) * (lat.ndim - 1)))
            lat = jax.device_put(lat, NamedSharding(mesh, spec))
        return lat

    def _note_skips(self, skips) -> None:
        """Record/log the on-device cache skip counter of the last run."""
        if self.cache is not None:
            self.last_cache_skips = int(np.asarray(skips))
            if self.verbose:
                print(f"cache skipped {self.last_cache_skips} transformer passes")

    def _wan_decode(self, latents):
        """3D-VAE decode; long sequences stream frame-by-frame (lax.scan with
        conv caches, peak activations = one latent frame) so 81-frame 720p
        fits 16GB HBM. Short clips use the full-sequence program."""
        from fastdm_tpu.pipeline.wan_vae import (
            wan_vae_decode, wan_vae_decode_chunked,
        )

        if latents.shape[2] > 8:
            return wan_vae_decode_chunked(self.vae_params, self.vae_cfg, latents)
        return wan_vae_decode(self.vae_params, self.vae_cfg, latents)

    def _to_images(self, img: jnp.ndarray) -> np.ndarray:
        img = np.asarray(jnp.clip(img * 0.5 + 0.5, 0.0, 1.0))
        return (img * 255).round().astype(np.uint8)

    def _generate_flux(
        self, prompt, negative_prompt=None, height=1024, width=1024,
        num_inference_steps=25, guidance_scale=3.5, seed=42,
        num_images_per_prompt=1, prompt_embeds=None, pooled_prompt_embeds=None,
        output_type="np", task="t2i", image=None, strength=0.7,
        control_image=None, controlnet_conditioning_scale=1.0, control_mode=None,
        **_,
    ):
        from fastdm_tpu.models.flux import flux_rope_cache
        from fastdm_tpu.pipeline.denoise import (
            flux_pack_latents, flux_unpack_latents, make_flux_denoiser,
        )

        if prompt_embeds is None:
            prompt_embeds, pooled_prompt_embeds = self.text_encoder.encode(
                prompt, num_images_per_prompt
            )
        b = prompt_embeds.shape[0]
        if task == "i2i" and image is not None:
            first = image[0] if isinstance(image, (list, tuple)) else image
            first = _resize_to_multiple(first, 16)
            height, width = first.shape[0], first.shape[1]
            if not isinstance(image, (list, tuple)):
                image = first
        ht, wt = height // 16, width // 16
        cos, sin = flux_rope_cache(self.cfg, prompt_embeds.shape[1], ht, wt)

        kontext = task == "i2i" and image is not None and \
            self.architecture_full == "flux-kontext"
        if (task == "i2i" and isinstance(image, (list, tuple)) and not kontext):
            image = _resize_to_multiple(image[0], 16)  # SDEdit takes one source
        start_step = 0
        if task == "i2i" and image is not None and not kontext:
            start_step = min(
                int(num_inference_steps * (1 - strength)), num_inference_steps - 1
            )
        if kontext:
            # reference tokens appended to the sequence, one id-plane per
            # reference image (multi-image "nano-banana" editing:
            # ref serve/readme.md; list input = gradio/api multi-upload)
            from fastdm_tpu.pipeline.denoise import (
                flux_pack_latents, make_flux_kontext_denoiser,
            )

            refs = list(image) if isinstance(image, (list, tuple)) else [image]
            refs = [_resize_to_multiple(im, 16) for im in refs]
            shapes = tuple((im.shape[0] // 16, im.shape[1] // 16) for im in refs)
            cos, sin = flux_rope_cache(
                self.cfg, prompt_embeds.shape[1], ht, wt, ref_tokens_hw=shapes
            )
            parts = []
            for im in refs:
                img = jnp.asarray(im, jnp.float32) / 127.5 - 1.0
                parts.append(flux_pack_latents(self._encode(self.vae_params, img[None])))
            ref_tokens = jnp.concatenate(parts, axis=1)
            ref_tokens = jnp.broadcast_to(ref_tokens, (b, *ref_tokens.shape[1:]))
            key = ("flux-kontext", ht, wt, shapes, num_inference_steps,
                   guidance_scale)
            if key not in self._denoisers:
                mu = flow_match_shift_mu(ht * wt)
                sched = FlowMatchEulerScheduler.create(
                    num_inference_steps, use_dynamic_shifting=True, mu=mu
                )
                self._denoisers[key] = make_flux_kontext_denoiser(
                    self.cfg, sched, num_inference_steps,
                    self.cache.config if self.cache else None, guidance_scale,
                )
            latents = self._latents((b, ht * wt, self.cfg.in_channels), seed)
            latents, skips = self._denoisers[key](
                self.params, latents, ref_tokens, prompt_embeds,
                pooled_prompt_embeds, cos, sin,
            )
            from fastdm_tpu.pipeline.denoise import flux_unpack_latents

            self._note_skips(skips)

            if output_type == "latent":
                return np.asarray(latents)
            z = flux_unpack_latents(latents, ht, wt)
            return self._to_images(self._decode(self.vae_params, z))

        if control_image is not None and self.cn_params is not None:
            # ControlNet t2i: hint image is VAE-encoded + packed like latents
            # (latent-hint checkpoints) or fed raw to the input_hint_block
            # conv stack (raw-image-hint variants — diffusers skips the VAE
            # for those; ref forward fastdm/model/controlnets.py:960-970)
            from fastdm_tpu.pipeline.denoise import make_flux_cn_denoiser

            img = jnp.asarray(control_image, jnp.float32) / 127.5 - 1.0
            if "input_hint_block" in self.cn_params:
                cn_cond = img[None].astype(jnp.bfloat16)
            else:
                z = self._encode(self.vae_params, img[None])
                cn_cond = flux_pack_latents(z)
            cn_cond = jnp.broadcast_to(cn_cond, (b, *cn_cond.shape[1:]))
            key = ("flux-cn", ht, wt, num_inference_steps, guidance_scale,
                   controlnet_conditioning_scale, control_mode)
            if key not in self._denoisers:
                mu = flow_match_shift_mu(ht * wt)
                sched = FlowMatchEulerScheduler.create(
                    num_inference_steps, use_dynamic_shifting=True, mu=mu
                )
                self._denoisers[key] = make_flux_cn_denoiser(
                    self.cfg, self.cn_cfg, sched, num_inference_steps,
                    guidance_scale, controlnet_conditioning_scale, control_mode,
                )
            latents = self._latents((b, ht * wt, self.cfg.in_channels), seed)
            latents, skips = self._denoisers[key](
                self.params, self.cn_params, latents, cn_cond, prompt_embeds,
                pooled_prompt_embeds, cos, sin,
            )
            self._note_skips(skips)
            if output_type == "latent":
                return np.asarray(latents)
            z = flux_unpack_latents(latents, ht, wt)
            return self._to_images(self._decode(self.vae_params, z))

        key = ("flux", ht, wt, num_inference_steps, guidance_scale, start_step)
        if key not in self._denoisers:
            mu = flow_match_shift_mu(ht * wt)
            sched = FlowMatchEulerScheduler.create(
                num_inference_steps, use_dynamic_shifting=True, mu=mu
            )
            cache_cfg = self.cache.config if self.cache is not None else None
            self._denoisers[key] = make_flux_denoiser(
                self.cfg, sched, num_inference_steps, cache_cfg, guidance_scale,
                start_step,
            )
            # sigmas are per-denoiser (mu depends on token count, count on
            # steps) — keyed storage, NOT a shared attribute a later compile
            # would overwrite (cache-hit i2i calls read them again)
            self._denoiser_sigmas_by_key[key] = sched.sigmas

        if task == "i2i" and image is not None:
            # SDEdit img2img: encode, pack, noise to sigmas[start_step]
            img = jnp.asarray(image, jnp.float32) / 127.5 - 1.0
            z = self._encode(self.vae_params, img[None])
            packed = flux_pack_latents(z).astype(jnp.float32)
            packed = jnp.broadcast_to(packed, (b, *packed.shape[1:]))
            noise = self._latents(packed.shape, seed)
            sig = float(self._denoiser_sigmas_by_key[key][start_step])
            latents = (1.0 - sig) * packed + sig * noise
        else:
            latents = self._latents((b, ht * wt, self.cfg.in_channels), seed)
        latents, skips = self._denoisers[key](
            self.params, latents, prompt_embeds, pooled_prompt_embeds, cos, sin
        )
        self._note_skips(skips)
        if output_type == "latent":
            return np.asarray(latents)
        z = flux_unpack_latents(latents, ht, wt)
        return self._to_images(self._decode(self.vae_params, z))

    def _generate_sd35(
        self, prompt, negative_prompt=None, height=1024, width=1024,
        num_inference_steps=25, guidance_scale=7.0, seed=42,
        num_images_per_prompt=1, output_type="np", task="t2i",
        image=None, strength=0.7, **_,
    ):
        from fastdm_tpu.models.sd35 import sd3_cropped_pos_embed
        from fastdm_tpu.pipeline.denoise_more import make_sd3_denoiser

        pos, pooled = self.text_encoder.encode(prompt, num_images_per_prompt)
        if guidance_scale > 1.0:  # CFG batch: uncond first (diffusers order)
            neg, neg_pooled = self.text_encoder.encode(
                negative_prompt or "", num_images_per_prompt
            )
            embeds = jnp.concatenate([neg, pos])
            pooled_all = jnp.concatenate([neg_pooled, pooled])
        else:
            embeds, pooled_all = pos, pooled
        b = pos.shape[0]
        lh, lw = height // 8, width // 8
        pos_embed = sd3_cropped_pos_embed(
            self.cfg, self.params.get("pos_embed_table"), lh, lw
        )
        start_step = 0
        if task == "i2i" and image is not None:
            start_step = min(
                int(num_inference_steps * (1 - strength)),
                num_inference_steps - 1)
        key = ("sd35", lh, lw, num_inference_steps, guidance_scale, start_step)
        if key not in self._denoisers:
            sched = FlowMatchEulerScheduler.create(num_inference_steps, shift=3.0)
            cache_cfg = self.cache.config if self.cache is not None else None
            self._denoisers[key] = make_sd3_denoiser(
                self.cfg, sched, num_inference_steps, guidance_scale, cache_cfg,
                start_step,
            )
            self._denoiser_sigmas_by_key[key] = sched.sigmas
        if task == "i2i" and image is not None:
            # SDEdit img2img (flow-match): z_image blended with noise at
            # sigmas[start_step] (ref task matrix: fastdm/model_entry.py:764)
            img = jnp.asarray(image, jnp.float32) / 127.5 - 1.0
            z = self._encode(self.vae_params, img[None]).astype(jnp.float32)
            z = jnp.broadcast_to(z, (b, *z.shape[1:]))
            noise = self._latents(z.shape, seed)
            sig = float(self._denoiser_sigmas_by_key[key][start_step])
            latents = (1.0 - sig) * z + sig * noise
        else:
            latents = self._latents((b, self.cfg.in_channels, lh, lw), seed)
        latents, skips = self._denoisers[key](self.params, latents, embeds, pooled_all, pos_embed)
        self._note_skips(skips)
        if output_type == "latent":
            return np.asarray(latents)
        return self._to_images(self._decode(self.vae_params, latents))

    def _generate_sdxl(
        self, prompt, negative_prompt=None, height=1024, width=1024,
        num_inference_steps=25, guidance_scale=5.0, seed=42,
        num_images_per_prompt=1, output_type="np", task="t2i",
        control_image=None, controlnet_conditioning_scale=1.0, guess_mode=False,
        ip_adapter_image=None, image=None, strength=0.7,
        **_,
    ):
        from fastdm_tpu.pipeline.denoise_more import make_sdxl_denoiser

        pos, pooled = self.text_encoder.encode(prompt, num_images_per_prompt)
        if guidance_scale > 1.0:  # CFG batch: uncond first (diffusers order)
            neg, neg_pooled = self.text_encoder.encode(
                negative_prompt or "", num_images_per_prompt
            )
            embeds = jnp.concatenate([neg, pos])
            pooled_all = jnp.concatenate([neg_pooled, pooled])
        else:
            embeds, pooled_all = pos, pooled
        b = pos.shape[0]
        time_ids = jnp.asarray(
            np.tile([height, width, 0, 0, height, width],
                    (embeds.shape[0], 1)), jnp.float32
        )
        lh, lw = height // 8, width // 8
        use_cn = control_image is not None and self.cn_params is not None
        start_step = 0
        if task == "i2i" and image is not None and not use_cn:
            start_step = min(
                int(num_inference_steps * (1 - strength)),
                num_inference_steps - 1)
        key = ("sdxl", lh, lw, num_inference_steps, guidance_scale,
               use_cn and (controlnet_conditioning_scale, guess_mode),
               start_step)
        if key not in self._denoisers:
            sched = EulerDiscreteScheduler.create(num_inference_steps)
            if use_cn:
                from fastdm_tpu.pipeline.denoise_more import make_sdxl_cn_denoiser

                self._denoisers[key] = make_sdxl_cn_denoiser(
                    self.cfg, sched, num_inference_steps, guidance_scale,
                    controlnet_conditioning_scale, guess_mode,
                )
            else:
                self._denoisers[key] = make_sdxl_denoiser(
                    self.cfg, sched, num_inference_steps, guidance_scale,
                    start_step,
                )
            self._denoiser_sigmas_by_key[key] = (sched.init_noise_sigma,
                                                 sched.sigmas)
        init_noise_sigma, sdxl_sigmas = self._denoiser_sigmas_by_key[key]
        if start_step:
            # SDEdit img2img (epsilon Euler): z_image + noise*sigmas[start]
            # (diffusers SDXL img2img add_noise at the strength timestep)
            img = jnp.asarray(image, jnp.float32) / 127.5 - 1.0
            z = self._encode(self.vae_params, img[None]).astype(jnp.float32)
            z = jnp.broadcast_to(z, (b, *z.shape[1:]))
            noise = self._latents(z.shape, seed)
            latents = z + noise * float(sdxl_sigmas[start_step])
        else:
            latents = self._latents((b, 4, lh, lw), seed) * init_noise_sigma
        if use_cn:
            # hint image stays in [0, 1] pixel space, NHWC (diffusers convention)
            cn_cond = jnp.asarray(control_image, jnp.float32)[None] / 255.0
            cn_cond = jnp.broadcast_to(cn_cond, (b, *cn_cond.shape[1:]))
            latents, skips = self._denoisers[key](
                self.params, self.cn_params, latents, embeds, pooled_all,
                time_ids, cn_cond,
            )
        else:
            ip_embeds = None
            if ip_adapter_image is not None and self.ip_proj is not None:
                from fastdm_tpu.layers.ip_adapter import (
                    image_projection_apply, ip_adapter_plus_projection_apply,
                )

                if self.ip_proj["kind"] == "plus":
                    # Plus conditions on the CLIP penultimate token grid
                    img_emb = self.image_encoder.encode(
                        ip_adapter_image, num_images_per_prompt, hidden_states=True
                    )
                    tokens = ip_adapter_plus_projection_apply(
                        self.ip_proj, img_emb,
                        heads=self.ip_proj["heads"],
                        head_dim=self.ip_proj["head_dim"],
                    )
                else:
                    img_emb = self.image_encoder.encode(
                        ip_adapter_image, num_images_per_prompt
                    )
                    tokens = image_projection_apply(
                        {k: self.ip_proj[k] for k in ("proj", "norm")}, img_emb,
                        self.ip_proj["num_tokens"],
                    )
                # CFG batch: zero image tokens for the uncond half
                # (diffusers); no-CFG runs keep the single batch — the
                # denoiser only doubles latents when guidance_scale > 1
                if guidance_scale > 1.0:
                    ip_embeds = jnp.concatenate(
                        [jnp.zeros_like(tokens), tokens])
                else:
                    ip_embeds = tokens
            latents, skips = self._denoisers[key](
                self.params, latents, embeds, pooled_all, time_ids, ip_embeds
            )
        self._note_skips(skips)
        if output_type == "latent":
            return np.asarray(latents)
        return self._to_images(self._decode(self.vae_params, latents))

    def _generate_qwen(
        self, prompt, negative_prompt=None, height=1024, width=1024,
        num_inference_steps=25, guidance_scale=4.0, true_cfg_scale=None, seed=42,
        num_images_per_prompt=1, output_type="np", task="t2i", image=None, **_,
    ):
        from fastdm_tpu.models.qwenimage import qwen_rope_cos_sin
        from fastdm_tpu.pipeline.denoise import flux_unpack_latents
        from fastdm_tpu.pipeline.denoise_more import make_qwen_denoiser

        scale = true_cfg_scale if true_cfg_scale is not None else guidance_scale
        edit = task == "i2i" and image is not None
        if edit:
            # qwen-image-edit: source image(s) condition both the VL prompt
            # encoding and the token stream (ref: FastDMEngine i2i,
            # model_entry.py:764-766 → diffusers QwenImageEdit[Plus]Pipeline;
            # a list of images is the api_server blend_mode="list" input)
            images = list(image) if isinstance(image, (list, tuple)) else [image]
            images = [_resize_to_multiple(im, 16) for im in images]
            height, width = images[0].shape[0], images[0].shape[1]
            pos = self.text_encoder.encode_with_image(
                prompt, images, num_images_per_prompt
            )
            neg = (
                self.text_encoder.encode_with_image(
                    negative_prompt or " ", images, num_images_per_prompt
                )
                if scale > 1.0
                else pos
            )
        else:
            pos = self.text_encoder.encode(prompt, num_images_per_prompt)
            neg = (
                self.text_encoder.encode(negative_prompt or " ", num_images_per_prompt)
                if scale > 1.0
                else pos
            )
        # pad both to one length
        s = max(pos.shape[1], neg.shape[1])
        pos = jnp.pad(pos, ((0, 0), (0, s - pos.shape[1]), (0, 0)))
        neg = jnp.pad(neg, ((0, 0), (0, s - neg.shape[1]), (0, 0)))
        b = pos.shape[0]
        ht, wt = height // 16, width // 16

        if edit:
            from fastdm_tpu.pipeline.denoise import flux_pack_latents
            from fastdm_tpu.pipeline.denoise_more import make_qwen_edit_denoiser

            src_parts, extra_shapes = [], []
            for im in images:
                img = jnp.asarray(im, jnp.float32) / 127.5 - 1.0
                z = self._encode(self.vae_params, img[None])
                src_parts.append(flux_pack_latents(z))
                extra_shapes.append((1, im.shape[0] // 16, im.shape[1] // 16))
            src_tokens = jnp.concatenate(src_parts, axis=1)
            src_tokens = jnp.broadcast_to(src_tokens, (b, *src_tokens.shape[1:]))
            cos, sin = qwen_rope_cos_sin(
                self.cfg, 1, ht, wt, s, extra_shapes=tuple(extra_shapes)
            )
            key = ("qwen-edit", ht, wt, num_inference_steps, scale, s,
                   src_tokens.shape[1])
            if key not in self._denoisers:
                mu = flow_match_shift_mu(ht * wt)
                sched = FlowMatchEulerScheduler.create(
                    num_inference_steps, use_dynamic_shifting=True, mu=mu
                )
                cache_cfg = self.cache.config if self.cache is not None else None
                self._denoisers[key] = make_qwen_edit_denoiser(
                    self.cfg, sched, num_inference_steps, scale, cache_cfg
                )
            latents = self._latents((b, ht * wt, self.cfg.in_channels), seed)
            latents, skips = self._denoisers[key](
                self.params, latents, src_tokens, pos, neg, cos, sin
            )
            self._note_skips(skips)
            if output_type == "latent":
                return np.asarray(latents)
            z = flux_unpack_latents(latents, ht, wt)
            return self._to_images(self._decode(self.vae_params, z))

        cos, sin = qwen_rope_cos_sin(self.cfg, 1, ht, wt, s)
        key = ("qwen", ht, wt, num_inference_steps, scale, s)
        if key not in self._denoisers:
            mu = flow_match_shift_mu(ht * wt)
            sched = FlowMatchEulerScheduler.create(
                num_inference_steps, use_dynamic_shifting=True, mu=mu
            )
            cache_cfg = self.cache.config if self.cache is not None else None
            self._denoisers[key] = make_qwen_denoiser(
                self.cfg, sched, num_inference_steps, scale, cache_cfg
            )
        latents = self._latents((b, ht * wt, self.cfg.in_channels), seed)
        latents, skips = self._denoisers[key](self.params, latents, pos, neg, cos, sin)
        self._note_skips(skips)
        if output_type == "latent":
            return np.asarray(latents)
        z = flux_unpack_latents(latents, ht, wt)
        return self._to_images(self._decode(self.vae_params, z))

    def _wan_i2v_latents(self, image, lf, lh, lw, num_frames):
        """First-frame conditioning: [4ch temporal mask ; encoded first frame]
        concatenated channel-wise with the noise latents (diffusers Wan i2v
        layout; the conditioned model's in_channels = 16 + 20 = 36)."""
        import jax.numpy as jnp

        from fastdm_tpu.pipeline.wan_vae import wan_vae_encode

        if self.vae_params is None:
            raise RuntimeError(
                "wan i2v needs the Wan VAE to encode the conditioning frame, "
                "but the VAE checkpoint could not be loaded (see the warning "
                "at engine init)"
            )

        img = jnp.asarray(image, jnp.float32) / 127.5 - 1.0  # (H, W, 3)
        video = jnp.concatenate(
            [img[None], jnp.zeros((num_frames - 1,) + img.shape, jnp.float32)], 0
        )[None]  # (1, F, H, W, 3)
        cond = wan_vae_encode(self.vae_params, self.vae_cfg, video)  # (1,16,lf,lh,lw)
        # temporal mask: frame 0 visible; packed 4x along the latent-frame axis
        msk = jnp.zeros((1, num_frames, lh, lw), jnp.float32).at[:, 0].set(1.0)
        first = jnp.repeat(msk[:, :1], 4, axis=1)
        msk = jnp.concatenate([first, msk[:, 1:]], axis=1)
        msk = msk.reshape(1, lf, 4, lh, lw).transpose(0, 2, 1, 3, 4)  # (1,4,lf,lh,lw)
        return jnp.concatenate([msk, cond], axis=1)  # (1, 20, lf, lh, lw)

    def _generate_wan(
        self, prompt, negative_prompt=None, height=480, width=832, num_frames=81,
        num_inference_steps=40, guidance_scale=5.0, guidance_scale_2=None, seed=42,
        output_type="np", task="t2v", image=None, **_,
    ):
        from fastdm_tpu.models.wan import wan_rope_cos_sin
        from fastdm_tpu.pipeline.denoise_more import make_wan_denoiser

        pos = self.text_encoder.encode(prompt)
        neg = self.text_encoder.encode(negative_prompt or "")
        # normalize to 4k+1 frames (the wan VAE's temporal stride contract;
        # diffusers does the same) — other counts break the i2v mask packing
        num_frames = max(1, 4 * ((num_frames - 1) // 4) + 1)
        lf = (num_frames - 1) // 4 + 1  # wan VAE temporal stride 4
        # spatial stride is 8 * patch_size (16 for the Wan2.2-TI2V 48-ch VAE)
        vs = 8 * getattr(self.vae_cfg, "patch_size", 1)
        lh, lw = height // vs, width // vs
        # long-video capacity: chunk the FFN over tokens (exact; see
        # feedforward_apply) — at A14B 720p/81f the unchunked FFN is the HBM
        # high-water that OOMs the cached forward on one v5e
        _pt, _ph, _pw = self.cfg.patch_size
        _tok = (lf // _pt) * (lh // _ph) * (lw // _pw)
        # Recomputed EVERY generate when the current value is auto-derived
        # (or stale-auto from a previous shape): persisting one shape's
        # chunk onto self.cfg silently disabled chunking at the next
        # non-dividing shape (advisor r4). A user-set value is never touched.
        _auto = getattr(self, "_ffn_chunk_auto", False)
        if _tok >= _FFN_CHUNK_MIN_TOKENS and _tok % 8 == 0 and (
                _auto or not self.cfg.ffn_chunk_tokens):
            import dataclasses as _dc
            # split_qkv_proj pairs with chunking at A14B dual-expert scale:
            # without it the fused-QKV epilogue temps alone exceed one v5e
            # next to a 7.3 GiB expert (doc/A14B_E2E_r4.log)
            self.cfg = _dc.replace(
                self.cfg, ffn_chunk_tokens=_tok // 8,
                split_qkv_proj=(self.params_2 is not None
                                and _tok >= _SPLIT_QKV_MIN_TOKENS))
            self._ffn_chunk_auto = True
        elif _auto and (_tok < _FFN_CHUNK_MIN_TOKENS or _tok % 8):
            import dataclasses as _dc
            self.cfg = _dc.replace(self.cfg, ffn_chunk_tokens=0,
                                   split_qkv_proj=False)
        # sparse attention block-size rounding (ref: model_entry.py:771-773)
        sparse_mask = None
        dense_steps = 0
        sparse_sig = None  # participates in the denoiser cache key: the
        # gather MODE and tile geometry are baked into the jitted closure
        # (self.cfg at build time), so flipping FASTDM_SPARSE_GATHER between
        # generates must not reuse a denoiser compiled for another mode —
        # fine tables fed to the super kernel read counts as bitmasks
        if self.sparse_attn is not None:
            pt, ph, pw = self.cfg.patch_size
            tokens = (lf // pt) * (lh // ph) * (lw // pw)
            self.sparse_attn.post_init(video_token_num=tokens, num_frame=lf // pt)
            from fastdm_tpu.kernels import kernel_registry

            # default = superblock gather at bq256 — measured 2.07x dense at
            # the A14B shape vs the fine form's 1.97x (BENCH_NOTES superblock
            # A/B, 2026-08-19); "fine"/"coarse"/"mask" remain selectable
            gather_mode = os.environ.get("FASTDM_SPARSE_GATHER", "super")
            if kernel_registry.backend_for("sdpa_sparse") != "pallas":
                gather_mode = "mask"
            if gather_mode in ("fine", "super"):
                # fine-gather form: compute tiles assembled from compacted
                # ACTIVE fine blocks by manual DMA — MXU work ~= the fine
                # mask density (sdpa_gather_fine). "super" variant: entries
                # are aligned runs of 4 fine blocks with exact sub-block
                # bitmasks (sdpa_gather_super) — 4x larger scattered DMAs,
                # the bandwidth form (BENCH_NOTES superblock A/B).
                bq, grp, fine = self.cfg.sparse_gather_fine_blocks
                bs = self.sparse_attn.config.block_size
                import dataclasses as _dc
                sb = 4 if gather_mode == "super" else 1
                if sb > 1 and (bq, grp) == type(self.cfg)().sparse_gather_fine_blocks[:2]:
                    # untouched fine defaults -> the super-tuned tile shape
                    # (bq256 halves the q-coarsened density; measured best)
                    bq, grp = 256, 32
                if (fine != bs or self.cfg.sparse_gather_superblock != sb
                        or (bq, grp) != self.cfg.sparse_gather_fine_blocks[:2]):
                    self.cfg = _dc.replace(
                        self.cfg, sparse_gather_fine_blocks=(bq, grp, bs),
                        sparse_gather_superblock=sb)
                # run the strict concrete-value contract checks HERE, where
                # the tables are host-side numpy — inside the jitted denoiser
                # they are tracers and the wrapper can only clip
                from fastdm_tpu.kernels import contracts
                if sb > 1:
                    idx, val, cnt = self.sparse_attn.block_lists_super(
                        bq, max(1, grp // sb), sb)
                    contracts.check_gather_super(
                        "engine.wan super-gather tables", jnp.asarray(idx),
                        jnp.asarray(val), jnp.asarray(cnt), tokens, tokens,
                        bq, max(1, grp // sb), bs, sb)
                else:
                    idx, val, cnt = self.sparse_attn.block_lists_fine(bq, grp)
                    contracts.check_gather_fine(
                        "engine.wan fine-gather tables", jnp.asarray(idx),
                        jnp.asarray(val), jnp.asarray(cnt), tokens, tokens,
                        bq, grp, self.sparse_attn.config.block_size)
                sparse_mask = (jnp.asarray(idx), jnp.asarray(val),
                               jnp.asarray(cnt))
                sparse_sig = (gather_mode, self.cfg.sparse_gather_fine_blocks,
                              self.cfg.sparse_gather_superblock)
            elif gather_mode == "coarse":
                # gather form: masked KV blocks cost neither DMA nor compute;
                # block_lists takes the gather tile sizes in TOKENS and
                # derives coarsening from the mask's own block_size
                bq, bk = self.cfg.sparse_gather_blocks
                idx, cnt = self.sparse_attn.block_lists(bq, bk)
                from fastdm_tpu.kernels import contracts
                contracts.check_gather_lists(
                    "engine.wan gather tables", jnp.asarray(idx),
                    jnp.asarray(cnt), tokens, tokens, bq, bk)
                sparse_mask = (jnp.asarray(idx), jnp.asarray(cnt))
                sparse_sig = (gather_mode, self.cfg.sparse_gather_blocks)
            else:
                # the masked-kernel path tiles at 128 (wan self-attn call);
                # retile the mask from its native block_size granularity
                sparse_mask = jnp.asarray(
                    self.sparse_attn.block_mask(
                        1, self.cfg.num_attention_heads, block_tokens=128
                    )
                )
                sparse_sig = ("mask",)
            dense_steps = self.sparse_attn.config.dense_steps
        cos, sin = wan_rope_cos_sin(self.cfg, lf, lh, lw)
        use_cache = self.cache is not None
        dual = self.params_2 is not None
        ti2v_path = (self.architecture_full == "wan2.2-ti2v" and image is not None
                     and task in ("i2v", "ti2v"))
        key = ("wan", lf, lh, lw, num_inference_steps, guidance_scale,
               guidance_scale_2, dense_steps, use_cache, dual,
               self._wan_sched_name, sparse_sig,
               self.cfg.ffn_chunk_tokens, self.cfg.split_qkv_proj)
        if not ti2v_path and key not in self._denoisers:
            sched = self._wan_scheduler(num_inference_steps)
            if dual:
                # A14B: PHASE-SPLIT loop — the expert boundary is a static
                # step index, so each expert gets its own jitted scan (no
                # per-step lax.cond over both 14B experts) and the inactive
                # expert may live in host RAM (offload_inactive_expert).
                # Cache semantics: one state per expert per CFG branch
                # (ref: AutoCache x2, model_entry.py:673-690)
                from fastdm_tpu.pipeline.denoise_more import (
                    make_wan_dual_phase_denoiser,
                )

                self._denoisers[key] = make_wan_dual_phase_denoiser(
                    self.cfg, sched, num_inference_steps,
                    self.cache.config if use_cache else None,
                    guidance_scale, guidance_scale_2,
                    self.boundary_ratio if self.boundary_ratio is not None else 0.875,
                    dense_steps,
                    place_params=self._place_params,
                )
            elif use_cache:
                from fastdm_tpu.pipeline.denoise_more import make_wan_cached_denoiser

                self._denoisers[key] = make_wan_cached_denoiser(
                    self.cfg, sched, num_inference_steps, self.cache.config,
                    guidance_scale, dense_steps,
                )
            else:
                self._denoisers[key] = make_wan_denoiser(
                    self.cfg, sched, num_inference_steps, guidance_scale,
                    guidance_scale_2,
                    # default boundary when transformer_2 exists but
                    # model_index.json lacks one — matches the cached path
                    # (and diffusers' A14B default), else expert 2 is loaded
                    # yet never runs
                    (self.boundary_ratio if self.boundary_ratio is not None
                     else (0.875 if dual else None)),
                    dense_steps,
                )
        # ti2v (5B): clean first latent frame + per-token timestep 0, no
        # channel concat (ref: the 5B pipeline's expand_timesteps flow)
        if ti2v_path:
            from fastdm_tpu.pipeline.denoise_more import make_wan_ti2v_denoiser
            from fastdm_tpu.pipeline.wan_vae import wan_vae_encode

            if self.vae_params is None:
                raise RuntimeError(
                    "wan ti2v needs the Wan VAE to encode the conditioning "
                    "frame, but the VAE checkpoint could not be loaded"
                )
            img = jnp.asarray(image, jnp.float32) / 127.5 - 1.0
            cond = wan_vae_encode(self.vae_params, self.vae_cfg, img[None, None])
            key = ("wan-ti2v", lf, lh, lw, num_inference_steps, guidance_scale,
                   dense_steps, use_cache, self._wan_sched_name,
                   self.cfg.ffn_chunk_tokens, self.cfg.split_qkv_proj)
            if key not in self._denoisers:
                sched = self._wan_scheduler(num_inference_steps)
                self._denoisers[key] = make_wan_ti2v_denoiser(
                    self.cfg, sched, num_inference_steps, guidance_scale,
                    self.cache.config if use_cache else None, dense_steps,
                )
            latents = self._latents((1, self.cfg.out_channels, lf, lh, lw), seed)
            latents, skips = self._denoisers[key](
                self.params, latents, cond, pos, neg, cos, sin, sparse_mask
            )
            self._note_skips(skips)
            if output_type == "latent" or self.vae_params is None:
                return np.asarray(latents)
            video = self._wan_decode(latents)
            return self._to_images(video)

        # noise latents carry out_channels (z_dim, 16); i2v models take
        # in_channels = z + 20 conditioning channels concatenated per step
        cond = None
        img_embeds = None
        if task == "i2v" and image is not None:
            cond = self._wan_i2v_latents(image, lf, lh, lw, num_frames)
            if self.wan_image_encoder is not None:
                # Wan2.1-style CLIP conditioning: penultimate-layer vision
                # tokens, same embeds for both CFG branches (diffusers
                # WanImageToVideoPipeline.encode_image)
                img_embeds = self.wan_image_encoder.encode(
                    image, hidden_states=True)
        latents = self._latents((1, self.cfg.out_channels, lf, lh, lw), seed)
        if dual:
            if img_embeds is not None:
                raise NotImplementedError(
                    "CLIP image conditioning with the dual-expert phase loop "
                    "is not wired (no released checkpoint combines them)")
            latents, skips = self._denoisers[key](
                self.params, self.params_2, latents, pos, neg, cos, sin,
                sparse_mask, cond,
            )
        elif use_cache:
            latents, skips = self._denoisers[key](
                self.params, latents, pos, neg, cos, sin, sparse_mask, cond,
                img_embeds,
            )
        else:
            latents, skips = self._denoisers[key](
                self.params, self.params_2, latents, pos, neg, cos, sin,
                sparse_mask, cond, img_embeds,
            )
        self._note_skips(skips)
        if output_type == "latent":
            return np.asarray(latents)
        if self.vae_params is None:
            return np.asarray(latents)
        video = self._wan_decode(latents)
        return self._to_images(video)
