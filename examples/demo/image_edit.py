"""Image-editing demo (i2i: flux-kontext / qwen-image-edit / sdxl img2img)
(ref: examples/demo/image_edit.py — same flags & flow)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from fastdm_tpu.common_args import add_engine_args, parse_mesh_shape, add_generation_args


def main():
    parser = argparse.ArgumentParser("fastdm_tpu image edit demo")
    add_engine_args(parser)
    add_generation_args(parser)
    parser.add_argument("--images", nargs="+", default=None,
                        help="multiple source images (multi-image edit; "
                             "qwen-image-edit-2509 style)")
    args = parser.parse_args()
    paths = args.images or ([args.image] if args.image else None)
    if not paths:
        raise SystemExit("--image (or --images) is required for i2i")

    import numpy as np
    from PIL import Image

    from fastdm_tpu.engine import FastDMEngine

    engine = FastDMEngine(
        model_path=args.model_path, architecture=args.architecture,
        use_fp8=args.use_fp8, use_int8=args.use_int8, use_int4=args.use_int4, pack_int4=args.pack_int4,
        kernel_backend=args.kernel_backend, cache_config=args.cache_config,
        mesh_shape=parse_mesh_shape(args.mesh_shape),
        snapshot_path=args.snapshot_path,
    )
    imgs = [np.asarray(Image.open(p).convert("RGB")) for p in paths]
    t0 = time.perf_counter()
    out = engine.generate(
        prompt=args.prompt, negative_prompt=args.negative_prompt,
        image=imgs if len(imgs) > 1 else imgs[0], task="i2i",
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
