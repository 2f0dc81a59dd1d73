"""Multi-model Gradio router (ref: examples/serve/multi_model_gradio.py).

One UI fanning out over N api_server instances (one model per port); requests
are plain HTTP POSTs to /generate. gradio gated like the single-model UI.
"""

import argparse
import base64
import io
import json
import urllib.request


def post_generate(base_url, payload, timeout=600):
    req = urllib.request.Request(
        f"{base_url}/generate",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def main():
    try:
        import gradio as gr
        from PIL import Image
    except ImportError:
        raise SystemExit("gradio/PIL not installed in this environment")

    parser = argparse.ArgumentParser("fastdm_tpu multi-model router")
    parser.add_argument(
        "--backends", nargs="+", required=True,
        help="name=url pairs, e.g. flux=http://localhost:8000 sdxl=http://localhost:8001",
    )
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=7860)
    args = parser.parse_args()
    backends = dict(b.split("=", 1) for b in args.backends)

    def generate(model, prompt, negative_prompt, height, width, steps, guidance, seed):
        out = post_generate(backends[model], {
            "prompt": prompt, "negative_prompt": negative_prompt or None,
            "height": int(height), "width": int(width),
            "num_inference_steps": int(steps), "guidance_scale": float(guidance),
            "seed": int(seed),
        })
        return [Image.open(io.BytesIO(base64.b64decode(b))) for b in out["images"]]

    with gr.Blocks(title="fastdm_tpu multi-model") as demo:
        gr.Markdown("# fastdm_tpu — multi-model router")
        model = gr.Dropdown(list(backends), value=next(iter(backends)), label="Model")
        prompt = gr.Textbox(label="Prompt", lines=3)
        negative = gr.Textbox(label="Negative prompt", lines=2)
        with gr.Row():
            height = gr.Slider(256, 2048, 1024, step=64, label="Height")
            width = gr.Slider(256, 2048, 1024, step=64, label="Width")
            steps = gr.Slider(1, 100, 25, step=1, label="Steps")
            guidance = gr.Slider(0.0, 15.0, 3.5, step=0.1, label="Guidance")
            seed = gr.Number(42, label="Seed", precision=0)
        btn = gr.Button("Generate", variant="primary")
        gallery = gr.Gallery(label="Results")
        btn.click(generate, [model, prompt, negative, height, width, steps,
                             guidance, seed], gallery)
    demo.launch(server_name=args.host, server_port=args.port)


if __name__ == "__main__":
    main()
