"""CLIP-score evaluation (ref: examples/evaluation/clip_score.py).

Generates images for a prompt set with the engine (or scores an existing
directory) and reports mean CLIP similarity. The reference's multi-GPU
data parallelism (one process per device) maps to batch-parallel generation
on the TPU plus host-side scoring.

Usage:
  python clip_score.py --model-path <dir> --prompts prompts.txt --use-int8
  python clip_score.py --images-dir out/ --prompts prompts.txt   # score only
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from fastdm_tpu.common_args import add_engine_args, add_generation_args


class ClipScorer:
    """CLIP similarity on host CPU (transformers). Works with stock ViT-L/14
    (77-token context) and LongCLIP checkpoints (e.g.
    zer0int/LongCLIP-GmP-ViT-L-14, 248-token context — the reference's
    --validate-model-path default): truncation follows the CHECKPOINT's own
    max position embeddings, so long photoreal prompts are scored in full
    instead of being cut at 77 tokens."""

    def __init__(self, clip_path: str = "openai/clip-vit-large-patch14",
                 batch_size: int = 16):
        import torch
        from transformers import CLIPModel, CLIPProcessor

        self.model = CLIPModel.from_pretrained(clip_path, torch_dtype=torch.float32)
        self.processor = CLIPProcessor.from_pretrained(clip_path)
        self.batch_size = batch_size
        # LongCLIP ships 248 position embeddings; the tokenizer config may
        # still say 77 — trust the model weights
        self.max_length = int(
            self.model.config.text_config.max_position_embeddings)

    def score(self, images, prompts) -> np.ndarray:
        import torch
        from PIL import Image

        pil = [Image.fromarray(im) if isinstance(im, np.ndarray) else im for im in images]
        sims = []
        with torch.no_grad():
            for i in range(0, len(pil), self.batch_size):
                inputs = self.processor(
                    text=list(prompts[i:i + self.batch_size]),
                    images=pil[i:i + self.batch_size], return_tensors="pt",
                    padding="max_length", truncation=True,
                    max_length=self.max_length,
                )
                out = self.model(**inputs)
                img = out.image_embeds / out.image_embeds.norm(dim=-1, keepdim=True)
                txt = out.text_embeds / out.text_embeds.norm(dim=-1, keepdim=True)
                sims.append(np.asarray((img * txt).sum(-1) * 100.0))
        return np.concatenate(sims)


def main():
    parser = argparse.ArgumentParser("clip score eval")
    add_engine_args(parser)
    add_generation_args(parser)
    parser.add_argument("--prompts", type=str, required=True,
                        help="text file, one prompt per line")
    parser.add_argument("--images-dir", type=str, default=None,
                        help="score existing images (named {i}.png) instead of generating")
    parser.add_argument("--clip-path", "--validate-model-path", dest="clip_path",
                        type=str, default="openai/clip-vit-large-patch14",
                        help="CLIP or LongCLIP checkpoint (the reference "
                             "passes zer0int/LongCLIP-GmP-ViT-L-14 here)")
    parser.add_argument("--max-prompts", type=int, default=None)
    parser.add_argument("--report", type=str, default="clip_score.json")
    args = parser.parse_args()

    with open(args.prompts) as f:
        prompts = [l.strip() for l in f if l.strip()]
    if args.max_prompts:
        prompts = prompts[: args.max_prompts]

    if args.images_dir:
        from PIL import Image

        images = [
            np.asarray(Image.open(os.path.join(args.images_dir, f"{i}.png")))
            for i in range(len(prompts))
        ]
    else:
        from fastdm_tpu.engine import FastDMEngine

        engine = FastDMEngine(
            model_path=args.model_path, architecture=args.architecture,
            use_fp8=args.use_fp8, use_int8=args.use_int8,
            kernel_backend=args.kernel_backend, cache_config=args.cache_config,
        )
        images = []
        for i, p in enumerate(prompts):
            img = engine.generate(
                prompt=p, height=args.height, width=args.width,
                num_inference_steps=args.num_inference_steps,
                guidance_scale=args.guidance_scale, seed=args.seed + i,
            )[0]
            images.append(img)

    scorer = ClipScorer(args.clip_path)
    scores = []
    bs = 16
    for i in range(0, len(prompts), bs):
        scores.append(scorer.score(images[i : i + bs], prompts[i : i + bs]))
    scores = np.concatenate(scores)
    report = {
        "mean_clip_score": float(scores.mean()),
        "std": float(scores.std()),
        "n": len(scores),
    }
    print(json.dumps(report, indent=2))
    with open(args.report, "w") as f:
        json.dump(report, f)


if __name__ == "__main__":
    main()
