"""Write a FULL-SCALE synthetic FLUX-dev checkpoint (diffusers layout, bf16,
~24 GB) to disk — the input for the chip-scale int4p accuracy gate
(parity_run int4p-vs-int8-vs-bf16 over the whole denoise, VERDICT r3 next #3)
and the through-the-engine e2e latency run (next #2).

Values are random at the REAL architecture (weight-value-independent for
latency; distribution-realistic for quant divergence). Layout comes from the
same `_synthetic_state_dict` the golden tests load, parameterized to
FLUX-dev dims (ref config: /root/reference's FluxTransformer2DModel defaults,
19 dual + 38 single, 24 heads x 128).

Run (CPU, ~10 min, needs ~26 GB free RAM + 24 GB disk):
  python examples/evaluation/make_synthetic_flux.py /root/flux-synth
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..",
                                "tests"))

FLUX_DEV = dict(
    num_layers=19, num_single_layers=38, attention_head_dim=128,
    num_attention_heads=24, joint_attention_dim=4096,
    pooled_projection_dim=768, in_channels=64, out_channels=64,
    axes_dims_rope=(16, 56, 56),
)


class _F32Rng:
    """standard_normal that generates float32 directly (2x faster, half the
    peak memory of numpy's float64 default)."""

    def __init__(self, seed):
        self.g = np.random.default_rng(seed)

    def standard_normal(self, shape):
        return self.g.standard_normal(shape, dtype=np.float32)


class _Bf16Dict(dict):
    """Holds tensors as bf16 so the full 12B state dict is ~24 GB, not 48."""

    def __setitem__(self, k, v):
        import ml_dtypes

        super().__setitem__(k, np.asarray(v).astype(ml_dtypes.bfloat16))


def main(out_dir: str):
    from test_golden_flux import _synthetic_state_dict

    from fastdm_tpu.native.safetensors_io import write_safetensors

    tdir = os.path.join(out_dir, "transformer")
    os.makedirs(tdir, exist_ok=True)
    print("generating 12B-param synthetic state dict (bf16)...", flush=True)
    sd = _Bf16Dict()
    _synthetic_state_dict(FLUX_DEV, _F32Rng(0), sd=sd)  # casts as tensors land
    n = sum(int(np.prod(v.shape)) for v in sd.values())
    print(f"{len(sd)} tensors, {n/1e9:.2f}B params; writing...", flush=True)
    write_safetensors(os.path.join(tdir, "model.safetensors"), dict(sd))
    with open(os.path.join(tdir, "config.json"), "w") as f:
        json.dump({k: (list(v) if isinstance(v, tuple) else v)
                   for k, v in FLUX_DEV.items()}, f)

    # tiny VAE so the engine constructor is satisfied; parity runs use
    # --latent (the synthetic gate measures transformer divergence, not a
    # placeholder VAE)
    from test_engine_e2e import _vae_sd, _write_st

    _write_st(os.path.join(out_dir, "vae", "model.safetensors"),
              _vae_sd(np.random.default_rng(1)))
    with open(os.path.join(out_dir, "vae", "config.json"), "w") as f:
        json.dump({"latent_channels": 4, "block_out_channels": [8, 8, 8, 8],
                   "layers_per_block": 1, "norm_num_groups": 4,
                   "scaling_factor": 0.5, "shift_factor": 0.0}, f)
    print(f"wrote {out_dir}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/flux-synth")
