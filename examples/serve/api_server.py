"""FastAPI serving front-end (ref: examples/serve/api_server.py).

Route/schema parity with the reference server:
  GET  /health, GET /get_model_info
  POST /generate  — image (png base64) or, for wan, video (mp4 base64)
  POST /edit      — multi-image input with blend modes
                    average/concatenate/first/list (ref: api_server.py:117-163)
plus the wan-lightning architecture aliases that force the distilled 4-step /
guidance-1.0 serving defaults (ref: api_server.py:446-451).

fastapi/uvicorn are optional in this image; the module gates the import and
the blend-mode helpers are plain PIL/numpy so they are unit-testable without
a server.
"""

import argparse
import base64
import io
import logging
import os
import sys
import tempfile
import time
from typing import Any, Dict, List, Optional, Union

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from fastdm_tpu.common_args import add_engine_args, parse_mesh_shape

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
logger = logging.getLogger("fastdm_tpu.serve")

try:
    from fastapi import FastAPI, HTTPException
    from pydantic import BaseModel, Field
    import uvicorn

    HAVE_FASTAPI = True
except ImportError:  # pragma: no cover
    HAVE_FASTAPI = False
    BaseModel = object

    def Field(default=None, **_kw):  # noqa: N802 - pydantic-compatible stub
        return default


class GenerateRequest(BaseModel if HAVE_FASTAPI else object):
    # field set mirrors the reference's GenerateRequest (api_server.py:49-63)
    model: str = Field(..., description="served model name")
    prompt: str = Field(..., description="generation prompt")
    negative_prompt: Optional[str] = Field(None, description="negative prompt")
    steps: Optional[int] = Field(default=25, description="denoise steps")
    guidance_scale: Optional[float] = Field(default=3.5, description="CFG scale")
    true_cfg_scale: Optional[float] = Field(4.0, description="Qwen true-CFG scale")
    seed: int = Field(default=0, description="random seed")
    width: Optional[int] = Field(default=1024)
    height: Optional[int] = Field(default=1024)
    num_frames: Optional[int] = Field(default=121, description="video frames (wan)")
    fps: int = Field(default=24, description="video fps (wan)")
    max_seq_len: Optional[int] = Field(default=512, description="text token budget")
    input_image: Optional[str] = Field(None, description="base64 source image (i2v)")


class EditRequest(GenerateRequest if HAVE_FASTAPI else object):
    # ref: api_server.py:64-73
    input_images: Optional[Union[str, List[str]]] = Field(
        None, description="base64 source image(s)"
    )
    blend_mode: Optional[str] = Field(
        default="list", description="average | concatenate | first | list"
    )
    concat_direction: Optional[str] = Field(
        default="horizontal", description="horizontal | vertical"
    )


class GenerateResponse(BaseModel if HAVE_FASTAPI else object):
    # ref: api_server.py:76-88
    success: bool
    type: str  # "image" or "video"
    image: Optional[str] = None
    video: Optional[str] = None
    format: str = "png"
    fps: Optional[int] = None
    frames: Optional[int] = None
    generation_time: float = 0.0
    model_used: str = ""
    parameters: Optional[Dict[str, Any]] = None


class ModelInfo(BaseModel if HAVE_FASTAPI else object):
    model_name: str = ""


def image_to_base64(image) -> str:
    """PIL image or HWC uint8 array -> base64 PNG (ref: api_server.py:92-97)."""
    import numpy as np
    from PIL import Image

    if isinstance(image, np.ndarray):
        image = Image.fromarray(image)
    buf = io.BytesIO()
    image.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def base64_to_image(b64: str):
    from PIL import Image

    return Image.open(io.BytesIO(base64.b64decode(b64)))


def video_to_base64_mp4(frames, fps: int) -> str:
    """(F, H, W, 3) uint8 -> base64 mp4 (ref: api_server.py:308-321)."""
    import imageio

    with tempfile.NamedTemporaryFile(suffix=".mp4", delete=False) as tmp:
        path = tmp.name
    try:
        imageio.mimsave(path, list(frames), fps=fps)
        with open(path, "rb") as f:
            return base64.b64encode(f.read()).decode()
    finally:
        os.unlink(path)


def concatenate_images(images, direction: str = "horizontal"):
    """Aspect-preserving concat at the min common height/width
    (ref: api_server.py:165-222)."""
    from PIL import Image

    if not images:
        return None
    if len(images) == 1:
        return images[0]

    if direction == "vertical":
        min_w = min(img.width for img in images)
        resized = [
            img.resize((min_w, int(min_w * img.height / img.width)),
                       Image.Resampling.LANCZOS)
            for img in images
        ]
        canvas = Image.new("RGB", (min_w, sum(i.height for i in resized)))
        y = 0
        for img in resized:
            canvas.paste(img, (0, y))
            y += img.height
        return canvas

    min_h = min(img.height for img in images)
    resized = [
        img.resize((int(min_h * img.width / img.height), min_h),
                   Image.Resampling.LANCZOS)
        for img in images
    ]
    canvas = Image.new("RGB", (sum(i.width for i in resized), min_h))
    x = 0
    for img in resized:
        canvas.paste(img, (x, 0))
        x += img.width
    return canvas


def process_multiple_images(images, blend_mode: str = "list",
                            concat_direction: str = "horizontal"):
    """Multi-image input handling (ref: api_server.py:117-163):
    'first' -> first image, 'list' -> the list untouched, 'average' ->
    pixel mean at image[0]'s size, 'concatenate' -> aspect-preserving concat."""
    import numpy as np
    from PIL import Image

    if not images:
        return None
    pil = []
    for img in images:
        if isinstance(img, np.ndarray):
            img = Image.fromarray(img)
        elif not isinstance(img, Image.Image):
            continue
        pil.append(img.convert("RGB"))
    if not pil:
        return None
    if len(pil) == 1:
        return pil[0]

    if blend_mode == "first":
        return pil[0]
    if blend_mode == "list":
        return pil
    if blend_mode == "average":
        base = pil[0].size
        arrays = [
            np.asarray(img.resize(base, Image.Resampling.LANCZOS), dtype=np.float32)
            for img in pil
        ]
        return Image.fromarray(np.mean(arrays, axis=0).astype(np.uint8))
    if blend_mode == "concatenate":
        return concatenate_images(pil, concat_direction)
    return pil[0]


def build_app(engine, served_model_name: str, wan_lightning: bool = False):
    import numpy as np

    app = FastAPI(title="FastDM-TPU API", version="1.0.0",
                  docs_url="/docs", redoc_url="/redoc")
    model_info = ModelInfo(model_name=served_model_name)
    is_video = engine.architecture == "wan"

    needs_input_image = "i2v" in getattr(engine, "architecture_full", "")

    def _check(req):
        if not req.prompt.strip():
            raise HTTPException(400, "prompt must not be empty")
        if req.model != model_info.model_name:
            raise HTTPException(400, f"unsupported model: {req.model}")

    def _base_params(req) -> Dict[str, Any]:
        p = {
            "prompt": req.prompt,
            "steps": req.steps,
            "guidance_scale": req.guidance_scale,
            "gen_seed": req.seed,
            "gen_width": req.width,
            "gen_height": req.height,
            "max_seq_len": req.max_seq_len,
        }
        if req.negative_prompt:
            p["negative_prompt"] = req.negative_prompt
        if engine.architecture == "qwen":
            p["true_cfg_scale"] = req.true_cfg_scale
        return p

    @app.post("/generate", response_model=GenerateResponse)
    def generate(req: GenerateRequest):
        _check(req)
        if needs_input_image and not req.input_image:
            raise HTTPException(400, "i2v requires input_image")
        if wan_lightning:
            # distilled 4-step serving defaults (ref: api_server.py:262-264)
            req.guidance_scale = 1.0
            req.steps = 4
        params = _base_params(req)
        if is_video:
            params["num_frames"] = req.num_frames
        if req.input_image:
            try:
                params["src_image"] = np.asarray(
                    base64_to_image(req.input_image).convert("RGB")
                )
            except HTTPException:
                raise
            except Exception as e:  # noqa: BLE001
                raise HTTPException(400, f"invalid source image: {e}") from e

        try:
            t0 = time.time()
            out = engine.generate(**params)
            dt = time.time() - t0
        except HTTPException:
            raise
        except Exception as e:  # noqa: BLE001
            logger.exception("generate failed")
            raise HTTPException(500, f"generation failed: {e}") from e

        logger.info("generate done in %.2fs", dt)
        if is_video:
            frames = out[0] if getattr(out, "ndim", 4) == 5 else out  # drop batch
            return GenerateResponse(
                success=True, type="video", video=video_to_base64_mp4(frames, req.fps),
                format="mp4", fps=req.fps, frames=len(frames), generation_time=dt,
                model_used=req.model,
            )
        img = out[0] if getattr(out, "ndim", 3) == 4 else out
        return GenerateResponse(
            success=True, type="image", image=image_to_base64(img), format="png",
            generation_time=dt, model_used=req.model,
            parameters={k: v for k, v in params.items() if k != "src_image"},
        )

    @app.post("/edit", response_model=GenerateResponse)
    def edit(req: EditRequest):
        _check(req)
        raw = req.input_images
        if isinstance(raw, str):
            raw = [raw]
        if not raw:
            raise HTTPException(400, "edit requires at least one input image")
        try:
            imgs = [base64_to_image(b) for b in raw]
        except Exception as e:  # noqa: BLE001
            raise HTTPException(400, f"invalid image data: {e}") from e
        processed = process_multiple_images(imgs, req.blend_mode, req.concat_direction)

        params = _base_params(req)
        if isinstance(processed, list):
            params["src_image"] = [np.asarray(i.convert("RGB")) for i in processed]
        elif processed is not None:
            params["src_image"] = np.asarray(processed.convert("RGB"))

        try:
            t0 = time.time()
            out = engine.generate(**params)
            dt = time.time() - t0
        except HTTPException:
            raise
        except Exception as e:  # noqa: BLE001
            logger.exception("edit failed")
            raise HTTPException(500, f"edit failed: {e}") from e

        logger.info("edit done in %.2fs", dt)
        img = out[0] if getattr(out, "ndim", 3) == 4 else out
        return GenerateResponse(
            success=True, type="image", image=image_to_base64(img), format="png",
            generation_time=dt, model_used=req.model,
        )

    @app.get("/get_model_info", response_model=ModelInfo)
    def get_model_info():
        return model_info

    @app.get("/health")
    def health():
        return {"status": "ok", "architecture": engine.architecture}

    return app


def main():
    if not HAVE_FASTAPI:
        raise SystemExit("fastapi/uvicorn not installed in this environment")
    parser = argparse.ArgumentParser("fastdm_tpu api server")
    add_engine_args(parser)
    parser.add_argument("--served-model-name", type=str, required=True)
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8080)
    args = parser.parse_args()

    from fastdm_tpu.engine import FastDMEngine

    # wan-lightning aliases: same checkpoints, distilled 4-step serving
    # defaults (ref: api_server.py:446-451)
    wan_lightning = False
    if args.architecture == "wan-lightning":
        args.architecture, wan_lightning = "wan2.2-t2v", True
    elif args.architecture == "wan-i2v-lightning":
        args.architecture, wan_lightning = "wan2.2-i2v", True

    t0 = time.time()
    engine = FastDMEngine(
        model_path=args.model_path,
        architecture=args.architecture,
        use_fp8=args.use_fp8,
        use_int8=args.use_int8,
        use_int4=args.use_int4,
        kernel_backend=args.kernel_backend,
        cache_config=args.cache_config,
        sparse_attn_config=args.sparse_attn_config,
        mesh_shape=parse_mesh_shape(args.mesh_shape),
        snapshot_path=args.snapshot_path,
    )
    logger.info("Model loading latency: %.4f seconds", time.time() - t0)
    uvicorn.run(build_app(engine, args.served_model_name, wan_lightning),
                host=args.host, port=args.port)


if __name__ == "__main__":
    main()
