"""ControlNet demo for SDXL / FLUX (ref: examples/demo/controlnet_demo.py —
same flow: engine with a ControlNet checkpoint, hint image conditions the
generation).

SDXL: the hint stays in pixel space and runs through the CN's 4-conv hint
encoder; guess_mode applies logspace residual scaling on the cond batch only.
FLUX: the hint is VAE-encoded and packed like latents; union checkpoints take
--control-mode (canny=0, ... per the checkpoint's mode table).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from fastdm_tpu.common_args import add_engine_args, parse_mesh_shape, add_generation_args


def main():
    parser = argparse.ArgumentParser("fastdm_tpu controlnet demo")
    add_engine_args(parser)
    add_generation_args(parser)
    parser.add_argument("--controlnet-path", required=True)
    parser.add_argument("--control-image", required=True)
    parser.add_argument("--conditioning-scale", type=float, default=1.0)
    parser.add_argument("--guess-mode", action="store_true")
    parser.add_argument("--control-mode", type=int, default=None,
                        help="union-checkpoint mode index (FLUX only)")
    args = parser.parse_args()

    import numpy as np
    from PIL import Image

    from fastdm_tpu.engine import FastDMEngine

    hint = np.asarray(
        Image.open(args.control_image).convert("RGB").resize((args.width, args.height)),
        np.uint8,
    )

    t0 = time.perf_counter()
    engine = FastDMEngine(
        model_path=args.model_path,
        architecture=args.architecture,
        use_fp8=args.use_fp8,
        use_int8=args.use_int8,
        use_int4=args.use_int4, pack_int4=args.pack_int4,
        kernel_backend=args.kernel_backend,
        cache_config=args.cache_config,
        controlnet_path=args.controlnet_path,
        mesh_shape=parse_mesh_shape(args.mesh_shape),
        snapshot_path=args.snapshot_path,
    )
    print(f"model + controlnet load: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    images = engine.generate(
        prompt=args.prompt,
        negative_prompt=args.negative_prompt,
        height=args.height,
        width=args.width,
        num_inference_steps=args.num_inference_steps,
        guidance_scale=args.guidance_scale,
        seed=args.seed,
        control_image=hint,
        controlnet_conditioning_scale=args.conditioning_scale,
        guess_mode=args.guess_mode,
        control_mode=args.control_mode,
    )
    print(f"generate: {time.perf_counter() - t0:.1f}s")
    Image.fromarray(images[0]).save(args.output)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
