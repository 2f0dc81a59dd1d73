"""Multi-model Gradio router (ref: examples/serve/multi_model_gradio.py).

One UI fanning out over N api_server instances (one model per port). Feature
parity with the reference's 1280-line router:
  * FOUR task tabs — text2image / text2video / image-edit / image2video —
    each with its OWN model dropdown holding only the backends that serve
    that task (classified from /get_model_info, ref: fetch_all_models) and a
    refresh button that re-queries live backends (ref: refresh_models).
  * Per-tab parameter panels: t2i gets true-CFG (qwen) next to guidance,
    video tabs get frames/fps, edit gets blend modes + concat direction with
    visibility toggling.
  * Result gallery + status line per tab; the generate button disables while
    a request is in flight and re-enables after (ref: *_sync handlers).
  * A persistent History tab (ui_common.GenerationHistory).
Transport is the reference-compatible request schema (POST /generate,
/edit). gradio gated like the single-model UI.
"""

import argparse
import base64
import io
import json
import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ui_common import GenerationHistory, TASKS, classify_model_task, format_gen_info


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


def discover_backends(backends, fallback_names):
    """Ask each api_server who it serves and classify it into task tabs
    (ref: fetch_all_models + model_type routing). Returns
    {task: [display name]}, {display name: (url, served model name)}."""
    by_task = {t: [] for t in TASKS}
    routes = {}
    for name, url in backends.items():
        served, arch = fallback_names.get(name, name), None
        try:
            info = get_json(f"{url}/get_model_info")
            served = info.get("model_name", served)
            # architecture rides /health (ref parity: get_model_info is
            # model_name-only)
            arch = get_json(f"{url}/health").get("architecture")
        except Exception:
            pass  # backend down or older server; classify by the CLI name
        routes[name] = (url, served)
        for task in classify_model_task(f"{name} {served}", arch):
            by_task[task].append(name)
    return by_task, routes


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
    parser.add_argument("--history-dir", default=None)
    args = parser.parse_args()
    backends = dict(b.split("=", 1) for b in args.backends)
    by_task, routes = discover_backends(backends, {k: k for k in backends})
    history = GenerationHistory(args.history_dir)

    def _decode(out):
        if out.get("type") == "video":
            tmp = tempfile.NamedTemporaryFile(suffix=".mp4", delete=False)
            tmp.write(base64.b64decode(out["video"]))
            tmp.close()
            return None, tmp.name
        return Image.open(io.BytesIO(base64.b64decode(out["image"]))), None

    def _refresh(task):
        def fn():
            fresh, fresh_routes = discover_backends(backends, {k: k for k in backends})
            # adopt the rediscovered served-model names: a backend that was
            # down at startup had a CLI-name fallback route, which the API
            # server rejects (api_server model-name check) once it is up
            routes.update(fresh_routes)
            by_task.update(fresh)
            choices = fresh[task]
            return gr.Dropdown(choices=choices,
                               value=choices[0] if choices else None)
        return fn

    def _record(img, vid, params):
        try:
            if vid is not None:
                history.add(video_path=vid, **params)
            elif img is not None:
                history.add(image=img, **params)
        except Exception:
            pass  # history is best-effort, never fails a generation

    def t2i(model, prompt, negative, steps, guidance, true_cfg, seed, width,
            height):
        if not model:
            return [], "no text2image backend selected", history.gallery()
        if not prompt:
            return [], "enter a prompt", history.gallery()
        url, served = routes[model]
        t0 = time.perf_counter()
        try:
            out = post_json(f"{url}/generate", {
                "model": served, "prompt": prompt,
                "negative_prompt": negative or None,
                "height": int(height), "width": int(width),
                "steps": int(steps), "guidance_scale": float(guidance),
                "true_cfg_scale": float(true_cfg), "seed": int(seed)})
        except Exception as e:
            return [], f"backend error: {e}", history.gallery()
        img, _ = _decode(out)
        params = dict(model=model, prompt=prompt, negative_prompt=negative,
                      steps=int(steps), guidance=float(guidance),
                      true_cfg=float(true_cfg), width=int(width),
                      height=int(height), seed=int(seed),
                      seconds=time.perf_counter() - t0)
        _record(img, None, params)
        return [img], format_gen_info(**params), history.gallery()

    def t2v(model, prompt, negative, steps, guidance, seed, width, height,
            num_frames, fps):
        if not model:
            return None, "no text2video backend selected", history.gallery()
        if not prompt:
            return None, "enter a prompt", history.gallery()
        url, served = routes[model]
        t0 = time.perf_counter()
        try:
            out = post_json(f"{url}/generate", {
                "model": served, "prompt": prompt,
                "negative_prompt": negative or None,
                "height": int(height), "width": int(width),
                "steps": int(steps), "guidance_scale": float(guidance),
                "seed": int(seed), "num_frames": int(num_frames),
                "fps": int(fps)})
        except Exception as e:
            return None, f"backend error: {e}", history.gallery()
        _, vid = _decode(out)
        params = dict(model=model, prompt=prompt, steps=int(steps),
                      guidance=float(guidance), width=int(width),
                      height=int(height), num_frames=int(num_frames),
                      fps=int(fps), seed=int(seed),
                      seconds=time.perf_counter() - t0)
        _record(None, vid, params)
        return vid, format_gen_info(**params), history.gallery()

    def i2v(model, prompt, image, negative, steps, guidance, seed, width,
            height, num_frames, fps):
        if not model:
            return None, "no image2video backend selected", history.gallery()
        if image is None:
            return None, "upload an input image", history.gallery()
        buf = io.BytesIO()
        Image.fromarray(image).save(buf, format="PNG")
        url, served = routes[model]
        t0 = time.perf_counter()
        try:
            out = post_json(f"{url}/generate", {
                "model": served, "prompt": prompt,
                "negative_prompt": negative or None,
                "input_images": [base64.b64encode(buf.getvalue()).decode()],
                "height": int(height), "width": int(width),
                "steps": int(steps), "guidance_scale": float(guidance),
                "seed": int(seed), "num_frames": int(num_frames),
                "fps": int(fps)})
        except Exception as e:
            return None, f"backend error: {e}", history.gallery()
        _, vid = _decode(out)
        params = dict(model=model, prompt=prompt, steps=int(steps),
                      guidance=float(guidance), num_frames=int(num_frames),
                      fps=int(fps), seed=int(seed),
                      seconds=time.perf_counter() - t0)
        _record(None, vid, params)
        return vid, format_gen_info(**params), history.gallery()

    def edit(model, prompt, files, blend_mode, direction, steps, guidance,
             true_cfg, seed):
        if not model:
            return [], "no edit backend selected", history.gallery()
        imgs_b64 = []
        for f in files or []:
            path = f.name if hasattr(f, "name") else (
                f[0] if isinstance(f, (tuple, list)) else f)
            with open(path, "rb") as fh:
                imgs_b64.append(base64.b64encode(fh.read()).decode())
        if not imgs_b64:
            return [], "upload at least one image", history.gallery()
        url, served = routes[model]
        t0 = time.perf_counter()
        try:
            out = post_json(f"{url}/edit", {
                "model": served, "prompt": prompt,
                "input_images": imgs_b64, "blend_mode": blend_mode,
                "concat_direction": direction, "steps": int(steps),
                "guidance_scale": float(guidance),
                "true_cfg_scale": float(true_cfg), "seed": int(seed)})
        except Exception as e:
            return [], f"backend error: {e}", history.gallery()
        img, _ = _decode(out)
        params = dict(model=model, prompt=prompt, blend_mode=blend_mode,
                      steps=int(steps), guidance=float(guidance),
                      true_cfg=float(true_cfg), seed=int(seed),
                      seconds=time.perf_counter() - t0)
        _record(img, None, params)
        return [img], format_gen_info(**params), history.gallery()

    def _busy():
        return gr.Button(interactive=False)

    def _ready():
        return gr.Button(interactive=True)

    def _model_row(task, label):
        choices = by_task[task]
        dd = gr.Dropdown(choices=choices,
                         value=choices[0] if choices else None, label=label)
        rb = gr.Button("Refresh models", variant="secondary", size="sm")
        rb.click(_refresh(task), None, dd)
        return dd

    with gr.Blocks(title="fastdm_tpu multi-model") as demo:
        gr.Markdown("# fastdm_tpu — multi-model router")
        with gr.Tab("Text → Image"):
            with gr.Row():
                with gr.Column(scale=3):
                    m1 = _model_row("t2i", "Model")
                    p1 = gr.Textbox(label="Prompt", lines=3)
                    n1 = gr.Textbox(label="Negative prompt", lines=1)
                    with gr.Row():
                        st1 = gr.Slider(1, 100, 25, step=1, label="Steps")
                        g1 = gr.Slider(0.0, 20.0, 3.5, step=0.1,
                                       label="Guidance")
                        tc1 = gr.Slider(0.0, 20.0, 4.0, step=0.1,
                                        label="True CFG (qwen)")
                    with gr.Row():
                        w1 = gr.Slider(256, 2048, 1024, step=64, label="Width")
                        h1 = gr.Slider(256, 2048, 1024, step=64, label="Height")
                        s1 = gr.Number(42, label="Seed", precision=0)
                    b1 = gr.Button("Generate", variant="primary", size="lg")
                with gr.Column(scale=2):
                    out1 = gr.Gallery(label="Results", columns=2)
                    info1 = gr.Textbox(label="Status / info", lines=6,
                                       interactive=False)
        with gr.Tab("Text → Video"):
            with gr.Row():
                with gr.Column(scale=3):
                    m2 = _model_row("t2v", "Model")
                    p2 = gr.Textbox(label="Prompt", lines=3)
                    n2 = gr.Textbox(label="Negative prompt", lines=1)
                    with gr.Row():
                        st2 = gr.Slider(1, 100, 40, step=1, label="Steps")
                        g2 = gr.Slider(0.0, 20.0, 5.0, step=0.1,
                                       label="Guidance")
                        s2 = gr.Number(42, label="Seed", precision=0)
                    with gr.Row():
                        w2 = gr.Slider(256, 1920, 1280, step=64, label="Width")
                        h2 = gr.Slider(256, 1280, 704, step=64, label="Height")
                    with gr.Row():
                        f2 = gr.Slider(5, 161, 121, step=4, label="Frames")
                        fps2 = gr.Slider(4, 60, 24, step=1, label="FPS")
                    b2 = gr.Button("Generate", variant="primary", size="lg")
                with gr.Column(scale=2):
                    out2 = gr.Video(label="Result")
                    info2 = gr.Textbox(label="Status / info", lines=6,
                                       interactive=False)
        with gr.Tab("Image Edit"):
            with gr.Row():
                with gr.Column(scale=3):
                    m3 = _model_row("edit", "Model")
                    p3 = gr.Textbox(label="Edit instruction", lines=3)
                    fl3 = gr.File(label="Input image(s)",
                                  file_count="multiple")
                    with gr.Row():
                        bl3 = gr.Dropdown(
                            ["list", "first", "average", "concatenate"],
                            value="list", label="Blend mode")
                        dir3 = gr.Dropdown(["horizontal", "vertical"],
                                           value="horizontal",
                                           label="Concat direction",
                                           visible=False)
                    with gr.Row():
                        st3 = gr.Slider(1, 100, 25, step=1, label="Steps")
                        g3 = gr.Slider(0.0, 20.0, 3.5, step=0.1,
                                       label="Guidance")
                        tc3 = gr.Slider(0.0, 20.0, 4.0, step=0.1,
                                        label="True CFG (qwen)")
                        s3 = gr.Number(42, label="Seed", precision=0)
                    b3 = gr.Button("Edit", variant="primary", size="lg")
                with gr.Column(scale=2):
                    out3 = gr.Gallery(label="Results", columns=2)
                    info3 = gr.Textbox(label="Status / info", lines=6,
                                       interactive=False)
        with gr.Tab("Image → Video"):
            with gr.Row():
                with gr.Column(scale=3):
                    m4 = _model_row("i2v", "Model")
                    p4 = gr.Textbox(label="Prompt", lines=3)
                    im4 = gr.Image(label="Input image")
                    n4 = gr.Textbox(label="Negative prompt", lines=1)
                    with gr.Row():
                        st4 = gr.Slider(1, 100, 40, step=1, label="Steps")
                        g4 = gr.Slider(0.0, 20.0, 5.0, step=0.1,
                                       label="Guidance")
                        s4 = gr.Number(42, label="Seed", precision=0)
                    with gr.Row():
                        w4 = gr.Slider(256, 1920, 1280, step=64, label="Width")
                        h4 = gr.Slider(256, 1280, 704, step=64, label="Height")
                        f4 = gr.Slider(5, 161, 121, step=4, label="Frames")
                        fps4 = gr.Slider(4, 60, 24, step=1, label="FPS")
                    b4 = gr.Button("Generate", variant="primary", size="lg")
                with gr.Column(scale=2):
                    out4 = gr.Video(label="Result")
                    info4 = gr.Textbox(label="Status / info", lines=6,
                                       interactive=False)
        with gr.Tab("History"):
            hist = gr.Gallery(label="Session history", columns=4,
                              value=history.gallery())
            hb = gr.Button("Refresh")
            hb.click(lambda: history.gallery(), None, hist)

        bl3.change(lambda m: gr.Dropdown(visible=(m == "concatenate")),
                   bl3, dir3)
        # disable the button while a request is in flight, re-enable after
        for btn, fn, ins, outs in (
            (b1, t2i, [m1, p1, n1, st1, g1, tc1, s1, w1, h1],
             [out1, info1, hist]),
            (b2, t2v, [m2, p2, n2, st2, g2, s2, w2, h2, f2, fps2],
             [out2, info2, hist]),
            (b3, edit, [m3, p3, fl3, bl3, dir3, st3, g3, tc3, s3],
             [out3, info3, hist]),
            (b4, i2v, [m4, p4, im4, n4, st4, g4, s4, w4, h4, f4, fps4],
             [out4, info4, hist]),
        ):
            btn.click(_busy, None, btn).then(
                fn, ins, outs).then(_ready, None, btn)
    demo.launch(server_name=args.host, server_port=args.port)


if __name__ == "__main__":
    main()
