"""FastAPI serving front-end (ref: examples/serve/api_server.py — same routes:
POST /generate, POST /edit; base64 image IO; one shared engine).

fastapi/uvicorn are optional in this image; the module gates the import and
the request/response schema mirrors the reference's pydantic models.
"""

import argparse
import base64
import io
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from fastdm_tpu.common_args import add_engine_args

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
logger = logging.getLogger("fastdm_tpu.serve")

try:
    from fastapi import FastAPI, HTTPException
    from pydantic import BaseModel
    import uvicorn

    HAVE_FASTAPI = True
except ImportError:  # pragma: no cover
    HAVE_FASTAPI = False
    BaseModel = object


class GenerateRequest(BaseModel if HAVE_FASTAPI else object):
    prompt: str
    negative_prompt: str | None = None
    height: int = 1024
    width: int = 1024
    num_inference_steps: int = 25
    guidance_scale: float = 3.5
    seed: int = 42
    num_images_per_prompt: int = 1


class EditRequest(BaseModel if HAVE_FASTAPI else object):
    prompt: str
    image: str  # base64 png/jpeg
    negative_prompt: str | None = None
    num_inference_steps: int = 25
    guidance_scale: float = 3.5
    seed: int = 42


def _encode_images(images) -> list:
    from PIL import Image

    out = []
    for img in images:
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        out.append(base64.b64encode(buf.getvalue()).decode())
    return out


def build_app(engine, wan_lightning: bool = False):
    app = FastAPI(title="fastdm_tpu")

    @app.post("/generate")
    def generate(req: GenerateRequest):
        if wan_lightning:
            # distilled 4-step lora (ref: api_server.py:262-264)
            req.guidance_scale = 1.0
            req.num_inference_steps = 4
        try:
            images = engine.generate(
                prompt=req.prompt,
                negative_prompt=req.negative_prompt,
                height=req.height,
                width=req.width,
                num_inference_steps=req.num_inference_steps,
                guidance_scale=req.guidance_scale,
                seed=req.seed,
                num_images_per_prompt=req.num_images_per_prompt,
            )
        except Exception as e:  # noqa: BLE001
            logger.exception("generate failed")
            raise HTTPException(500, str(e)) from e
        return {"images": _encode_images(images)}

    @app.post("/edit")
    def edit(req: EditRequest):
        import numpy as np
        from PIL import Image

        try:
            img = Image.open(io.BytesIO(base64.b64decode(req.image))).convert("RGB")
            images = engine.generate(
                prompt=req.prompt,
                negative_prompt=req.negative_prompt,
                image=np.asarray(img),
                num_inference_steps=req.num_inference_steps,
                guidance_scale=req.guidance_scale,
                seed=req.seed,
                task="i2i",
            )
        except Exception as e:  # noqa: BLE001
            logger.exception("edit failed")
            raise HTTPException(500, str(e)) from e
        return {"images": _encode_images(images)}

    @app.get("/health")
    def health():
        return {"status": "ok", "architecture": engine.architecture}

    return app


def main():
    if not HAVE_FASTAPI:
        raise SystemExit("fastapi/uvicorn not installed in this environment")
    parser = argparse.ArgumentParser("fastdm_tpu api server")
    add_engine_args(parser)
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    args = parser.parse_args()

    from fastdm_tpu.engine import FastDMEngine

    # wan-lightning aliases: same checkpoints, distilled 4-step serving
    # defaults (ref: api_server.py:445-451)
    wan_lightning = False
    if args.architecture == "wan-lightning":
        args.architecture, wan_lightning = "wan2.2-t2v", True
    elif args.architecture == "wan-i2v-lightning":
        args.architecture, wan_lightning = "wan2.2-i2v", True

    engine = FastDMEngine(
        model_path=args.model_path,
        architecture=args.architecture,
        use_fp8=args.use_fp8,
        use_int8=args.use_int8,
        kernel_backend=args.kernel_backend,
        cache_config=args.cache_config,
        sparse_attn_config=args.sparse_attn_config,
    )
    uvicorn.run(build_app(engine, wan_lightning), host=args.host, port=args.port)


if __name__ == "__main__":
    main()
