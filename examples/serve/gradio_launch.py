"""Single-model Gradio web UI (ref: examples/serve/gradio_launch.py).

gradio is optional in this image (imports gated); layout mirrors the
reference: a Generate tab (prompt + negative prompt, size/steps/guidance/
seed) and an Edit tab with multi-image upload (the reference's
"nano-banana"-style multi-image editing, examples/serve/readme.md).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from fastdm_tpu.common_args import add_engine_args, parse_mesh_shape


def main():
    try:
        import gradio as gr
    except ImportError:
        raise SystemExit("gradio not installed in this environment")

    parser = argparse.ArgumentParser("fastdm_tpu gradio ui")
    add_engine_args(parser)
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=7860)
    args = parser.parse_args()

    from fastdm_tpu.engine import FastDMEngine

    engine = FastDMEngine(
        model_path=args.model_path, architecture=args.architecture,
        use_fp8=args.use_fp8, use_int8=args.use_int8,
        kernel_backend=args.kernel_backend, cache_config=args.cache_config,
        sparse_attn_config=args.sparse_attn_config,
        mesh_shape=parse_mesh_shape(args.mesh_shape),
    )

    def generate(prompt, negative_prompt, height, width, steps, guidance, seed):
        images = engine.generate(
            prompt=prompt, negative_prompt=negative_prompt or None,
            height=int(height), width=int(width), num_inference_steps=int(steps),
            guidance_scale=float(guidance), seed=int(seed),
        )
        return [img for img in images]

    def edit(prompt, files, steps, guidance, seed):
        import numpy as np
        from PIL import Image

        srcs = []
        for f in files or []:
            path = f.name if hasattr(f, "name") else f
            srcs.append(np.asarray(Image.open(path).convert("RGB")))
        if not srcs:
            raise gr.Error("upload at least one source image")
        images = engine.generate(
            prompt=prompt, task="i2i",
            image=srcs if len(srcs) > 1 else srcs[0],
            num_inference_steps=int(steps), guidance_scale=float(guidance),
            true_cfg_scale=float(guidance), seed=int(seed),
        )
        return [img for img in images]

    with gr.Blocks(title=f"fastdm_tpu [{args.architecture}]") as demo:
        gr.Markdown(f"# fastdm_tpu — {args.architecture}")
        with gr.Tab("Generate"):
            with gr.Row():
                with gr.Column():
                    prompt = gr.Textbox(label="Prompt", lines=3)
                    negative = gr.Textbox(label="Negative prompt", lines=2)
                    with gr.Row():
                        height = gr.Slider(256, 2048, 1024, step=64, label="Height")
                        width = gr.Slider(256, 2048, 1024, step=64, label="Width")
                    with gr.Row():
                        steps = gr.Slider(1, 100, 25, step=1, label="Steps")
                        guidance = gr.Slider(0.0, 15.0, 3.5, step=0.1, label="Guidance")
                        seed = gr.Number(42, label="Seed", precision=0)
                    btn = gr.Button("Generate", variant="primary")
                gallery = gr.Gallery(label="Results")
            btn.click(generate,
                      [prompt, negative, height, width, steps, guidance, seed],
                      gallery)
        with gr.Tab("Edit"):
            with gr.Row():
                with gr.Column():
                    eprompt = gr.Textbox(label="Edit instruction", lines=3)
                    efiles = gr.File(label="Source image(s)", file_count="multiple")
                    with gr.Row():
                        esteps = gr.Slider(1, 100, 25, step=1, label="Steps")
                        eguidance = gr.Slider(0.0, 15.0, 4.0, step=0.1,
                                              label="True CFG")
                        eseed = gr.Number(42, label="Seed", precision=0)
                    ebtn = gr.Button("Edit", variant="primary")
                egallery = gr.Gallery(label="Results")
            ebtn.click(edit, [eprompt, efiles, esteps, eguidance, eseed], egallery)
    demo.launch(server_name=args.host, server_port=args.port)


if __name__ == "__main__":
    main()
