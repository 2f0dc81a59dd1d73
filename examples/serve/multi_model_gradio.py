"""Multi-model Gradio router (ref: examples/serve/multi_model_gradio.py).

One UI fanning out over N api_server instances (one model per port): the
router queries each backend's /get_model_info at startup, exposes a model
dropdown, and POSTs /generate (image or video) and /edit (multi-image with
blend modes) using the reference-compatible request schema. gradio gated
like the single-model UI.
"""

import argparse
import base64
import io
import json
import tempfile
import urllib.request


def post_json(url, payload, timeout=600):
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def get_json(url, timeout=10):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return json.loads(r.read())


def fetch_model_names(backends, fallback_names):
    """Ask each api_server who it serves (ref: get_model_info fan-in)."""
    names = {}
    for name, url in backends.items():
        try:
            names[name] = get_json(f"{url}/get_model_info")["model_name"]
        except Exception:  # backend down or older server; use the CLI name
            names[name] = fallback_names.get(name, name)
    return names


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
    served = fetch_model_names(backends, {k: k for k in backends})

    def _decode(out):
        if out.get("type") == "video":
            tmp = tempfile.NamedTemporaryFile(suffix=".mp4", delete=False)
            tmp.write(base64.b64decode(out["video"]))
            tmp.close()
            return None, tmp.name
        return Image.open(io.BytesIO(base64.b64decode(out["image"]))), None

    def generate(model, prompt, negative_prompt, height, width, steps,
                 guidance, seed, num_frames, fps):
        out = post_json(f"{backends[model]}/generate", {
            "model": served[model],
            "prompt": prompt, "negative_prompt": negative_prompt or None,
            "height": int(height), "width": int(width),
            "steps": int(steps), "guidance_scale": float(guidance),
            "seed": int(seed), "num_frames": int(num_frames), "fps": int(fps),
        })
        img, vid = _decode(out)
        return [img] if img else [], vid

    def edit(model, prompt, files, blend_mode, concat_direction, steps,
             guidance, seed):
        imgs_b64 = []
        for f in files or []:
            with open(f.name if hasattr(f, "name") else f, "rb") as fh:
                imgs_b64.append(base64.b64encode(fh.read()).decode())
        out = post_json(f"{backends[model]}/edit", {
            "model": served[model], "prompt": prompt,
            "input_images": imgs_b64, "blend_mode": blend_mode,
            "concat_direction": concat_direction,
            "steps": int(steps), "guidance_scale": float(guidance),
            "seed": int(seed),
        })
        img, _ = _decode(out)
        return [img] if img else []

    with gr.Blocks(title="fastdm_tpu multi-model") as demo:
        gr.Markdown("# fastdm_tpu — multi-model router")
        model = gr.Dropdown(list(backends), value=next(iter(backends)), label="Model")
        with gr.Tab("Generate"):
            prompt = gr.Textbox(label="Prompt", lines=3)
            negative = gr.Textbox(label="Negative prompt", lines=2)
            with gr.Row():
                height = gr.Slider(256, 2048, 1024, step=64, label="Height")
                width = gr.Slider(256, 2048, 1024, step=64, label="Width")
                steps = gr.Slider(1, 100, 25, step=1, label="Steps")
                guidance = gr.Slider(0.0, 15.0, 3.5, step=0.1, label="Guidance")
                seed = gr.Number(42, label="Seed", precision=0)
            with gr.Row():
                num_frames = gr.Slider(1, 161, 121, step=4, label="Frames (wan)")
                fps = gr.Slider(4, 60, 24, step=1, label="FPS (wan)")
            btn = gr.Button("Generate", variant="primary")
            gallery = gr.Gallery(label="Images")
            video = gr.Video(label="Video")
            btn.click(generate, [model, prompt, negative, height, width, steps,
                                 guidance, seed, num_frames, fps],
                      [gallery, video])
        with gr.Tab("Edit"):
            eprompt = gr.Textbox(label="Prompt", lines=3)
            files = gr.File(label="Input image(s)", file_count="multiple")
            with gr.Row():
                blend = gr.Dropdown(["list", "first", "average", "concatenate"],
                                    value="list", label="Blend mode")
                direction = gr.Dropdown(["horizontal", "vertical"],
                                        value="horizontal", label="Concat direction")
                esteps = gr.Slider(1, 100, 25, step=1, label="Steps")
                eguidance = gr.Slider(0.0, 15.0, 3.5, step=0.1, label="Guidance")
                eseed = gr.Number(42, label="Seed", precision=0)
            ebtn = gr.Button("Edit", variant="primary")
            egallery = gr.Gallery(label="Results")
            ebtn.click(edit, [model, eprompt, files, blend, direction, esteps,
                              eguidance, eseed], egallery)
    demo.launch(server_name=args.host, server_port=args.port)


if __name__ == "__main__":
    main()
