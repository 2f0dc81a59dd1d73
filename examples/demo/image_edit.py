"""Image-editing demo (i2i: flux-kontext / qwen-image-edit / sdxl img2img)
(ref: examples/demo/image_edit.py — same flags & flow)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from fastdm_tpu.common_args import add_engine_args, add_generation_args


def main():
    parser = argparse.ArgumentParser("fastdm_tpu image edit demo")
    add_engine_args(parser)
    add_generation_args(parser)
    args = parser.parse_args()
    if args.image is None:
        raise SystemExit("--image is required for i2i")

    import numpy as np
    from PIL import Image

    from fastdm_tpu.engine import FastDMEngine

    engine = FastDMEngine(
        model_path=args.model_path, architecture=args.architecture,
        use_fp8=args.use_fp8, use_int8=args.use_int8,
        kernel_backend=args.kernel_backend, cache_config=args.cache_config,
    )
    image = np.asarray(Image.open(args.image).convert("RGB"))
    t0 = time.perf_counter()
    out = engine.generate(
        prompt=args.prompt, negative_prompt=args.negative_prompt,
        image=image, task="i2i",
        num_inference_steps=args.num_inference_steps,
        guidance_scale=args.guidance_scale,
        true_cfg_scale=args.true_cfg_scale if "qwen" in args.architecture else None,
        seed=args.seed,
    )
    print(f"edit latency: {time.perf_counter() - t0:.2f}s")
    Image.fromarray(out[0]).save(args.output)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
