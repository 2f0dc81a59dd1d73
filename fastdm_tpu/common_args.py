"""Shared CLI argument builders (ref: fastdm/common_args.py — same flags, so
reference command lines work unchanged)."""

from __future__ import annotations

import argparse


def add_engine_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    parser.add_argument("--model-path", type=str, required=True,
                        help="diffusers-format model directory")
    parser.add_argument("--architecture", type=str, default="flux",
                        choices=["flux", "flux-dev", "flux-krea", "flux-kontext",
                                 "sd35", "sdxl", "qwen-image", "qwen-image-edit",
                                 "wan2.2-t2v", "wan2.2-i2v", "wan2.2-ti2v"])
    parser.add_argument("--use-fp8", action="store_true",
                        help="W8A8 float8_e4m3fn quantization")
    parser.add_argument("--use-int8", action="store_true",
                        help="W8A8 int8 quantization (asym activations)")
    parser.add_argument("--use-int4", action="store_true",
                        help="W4A4 int4 + SVDQuant low-rank branch (TPU "
                             "extension; the v5e MXU s4 rate is 1.5x its s8)")
    parser.add_argument("--pack-int4", action="store_true",
                        help="with --use-int4: pack two int4 per byte in HBM "
                             "(0.5 byte/param capacity form — fits Wan-A14B "
                             "on a 16GB chip; unpacked in-graph before the dot)")
    parser.add_argument("--kernel-backend", type=str, default="auto",
                        choices=["auto", "jnp", "pallas"],
                        help="kernel dispatch backend (ref: KERNEL_BACKEND env)")
    parser.add_argument("--cache-config", type=str, default=None,
                        help="JSON config for TeaCache/FBCache/DiCache")
    parser.add_argument("--sparse-attn-config", type=str, default=None,
                        help="JSON config for radial sparse attention")
    parser.add_argument("--oom-resolve", action="store_true",
                        help="accepted for parity; text encoders are always host-side")
    parser.add_argument("--mesh-shape", type=str, default=None,
                        help="dp,sp,tp device-mesh shape for multi-chip "
                             "sharding, e.g. 1,2,4 (new vs the single-GPU "
                             "reference)")
    parser.add_argument("--quant-mods", action="store_true",
                        help="also quantize AdaLN/mod projections (small-HBM chips)")
    parser.add_argument("--snapshot-path", type=str, default=None,
                        help="quantized-snapshot cache dir: first run writes "
                             "the post-quantization param trees there, later "
                             "runs mmap them back and skip checkpoint parsing "
                             "+ fusion + quantization (TPU extension)")
    return parser


def add_generation_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    parser.add_argument("--task", type=str, default="t2i",
                        choices=["t2i", "i2i", "t2v", "i2v"])
    parser.add_argument("--prompt", type=str,
                        default="a photo of an astronaut riding a horse on mars")
    parser.add_argument("--negative-prompt", type=str, default=None)
    parser.add_argument("--height", type=int, default=1024)
    parser.add_argument("--width", type=int, default=1024)
    parser.add_argument("--num-inference-steps", type=int, default=25)
    parser.add_argument("--guidance-scale", type=float, default=3.5)
    parser.add_argument("--true-cfg-scale", type=float, default=4.0,
                        help="qwen-image true CFG scale")
    parser.add_argument("--num-frames", type=int, default=81)
    parser.add_argument("--fps", type=int, default=16)
    parser.add_argument("--image", type=str, default=None,
                        help="input image path (i2i / i2v)")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--num-images-per-prompt", type=int, default=1)
    parser.add_argument("--output", type=str, default="output.png")
    parser.add_argument("--warmup", type=int, default=1,
                        help="warmup generations before the timed one")
    return parser


def parse_mesh_shape(val):
    """'1,2,4' -> (1, 2, 4); None passes through."""
    if not val:
        return None
    return tuple(int(x) for x in val.split(","))
