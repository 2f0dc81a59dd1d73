"""CLI generation demo (ref: examples/demo/gen.py — same flags & flow:
engine -> warmup -> timed generate -> save)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from fastdm_tpu.common_args import add_engine_args, parse_mesh_shape, add_generation_args


def save_images(images, path, fps=16):
    """Images: (N, H, W, 3) stills or (1, F, H, W, 3) video frames (t2v).
    Video saves per-frame PNGs (plus .mp4 when imageio is available —
    ref: gen.py export_to_video flow)."""
    import numpy as np
    from PIL import Image

    base, ext = os.path.splitext(path)
    arr = np.asarray(images)
    if arr.ndim == 5:  # video: (B, F, H, W, 3)
        frames = arr[0]
        try:
            import imageio

            mp4 = base + ".mp4"
            imageio.mimsave(mp4, list(frames), fps=fps)
            print(f"saved {mp4} ({len(frames)} frames)")
            return
        except Exception as e:  # no imageio / no ffmpeg backend
            print(f"mp4 unavailable ({e.__class__.__name__}); writing frames")
            for i, f in enumerate(frames):
                fp = f"{base}_f{i:04d}.png"
                Image.fromarray(f).save(fp)
            print(f"saved {len(frames)} frames as {base}_f*.png")
            return
    for i, img in enumerate(arr):
        p = path if len(arr) == 1 else f"{base}_{i}{ext}"
        Image.fromarray(img).save(p)
        print(f"saved {p}")


def main():
    parser = argparse.ArgumentParser("fastdm_tpu generation demo")
    add_engine_args(parser)
    add_generation_args(parser)
    args = parser.parse_args()

    from fastdm_tpu.engine import FastDMEngine

    t0 = time.perf_counter()
    engine = FastDMEngine(
        model_path=args.model_path,
        architecture=args.architecture,
        use_fp8=args.use_fp8,
        use_int8=args.use_int8,
        use_int4=args.use_int4, pack_int4=args.pack_int4,
        kernel_backend=args.kernel_backend,
        cache_config=args.cache_config,
        sparse_attn_config=args.sparse_attn_config,
        oom_resolve=args.oom_resolve,
        mesh_shape=parse_mesh_shape(args.mesh_shape),
        quant_mods=args.quant_mods,
        snapshot_path=args.snapshot_path,
    )
    print(f"model load latency: {time.perf_counter() - t0:.2f}s")

    gen_kwargs = dict(
        prompt=args.prompt,
        negative_prompt=args.negative_prompt,
        height=args.height,
        width=args.width,
        num_inference_steps=args.num_inference_steps,
        guidance_scale=args.guidance_scale,
        seed=args.seed,
        num_images_per_prompt=args.num_images_per_prompt,
        task=args.task,
    )

    for _ in range(args.warmup):
        engine.generate(**gen_kwargs)

    t0 = time.perf_counter()
    if args.task in ("t2v", "i2v", "ti2v"):
        gen_kwargs["num_frames"] = args.num_frames
        if args.image:
            import numpy as np
            from PIL import Image

            gen_kwargs["image"] = np.asarray(Image.open(args.image).convert("RGB"))
    images = engine.generate(**gen_kwargs)
    print(f"generation latency: {time.perf_counter() - t0:.2f}s")
    save_images(images, args.output, fps=args.fps)


if __name__ == "__main__":
    main()
