"""FID evaluation (ref: examples/evaluation/fid.py).

Computes the Frechet distance between feature distributions of a reference
image set and generated images. Feature extractor: torchvision InceptionV3
pool3 when available (the standard FID), else CLIP ViT-L vision features
("CLIP-FID" — comparable across runs of this script, noted in the report).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def _load_images(d, limit=None):
    from PIL import Image

    names = sorted(
        f for f in os.listdir(d) if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    if limit:
        names = names[:limit]
    return [np.asarray(Image.open(os.path.join(d, f)).convert("RGB")) for f in names]


class FeatureExtractor:
    def __init__(self, clip_path="openai/clip-vit-large-patch14"):
        self.kind = None
        try:
            import torch
            import torchvision

            self.model = torchvision.models.inception_v3(
                weights="IMAGENET1K_V1", aux_logits=True
            )
            self.model.fc = torch.nn.Identity()
            self.model.eval()
            self.kind = "inception_v3_pool3"
        except Exception:
            import torch
            from transformers import CLIPProcessor, CLIPVisionModelWithProjection

            self.model = CLIPVisionModelWithProjection.from_pretrained(
                clip_path, torch_dtype=torch.float32
            )
            self.processor = CLIPProcessor.from_pretrained(clip_path)
            self.kind = "clip_vit_l"

    def features(self, images) -> np.ndarray:
        import torch

        feats = []
        with torch.no_grad():
            if self.kind == "inception_v3_pool3":
                import torch.nn.functional as F

                for i in range(0, len(images), 16):
                    batch = np.stack(images[i : i + 16]).astype(np.float32) / 255.0
                    x = torch.from_numpy(batch).permute(0, 3, 1, 2)
                    x = F.interpolate(x, (299, 299), mode="bilinear", align_corners=False)
                    x = x * 2 - 1
                    feats.append(self.model(x).numpy())
            else:
                from PIL import Image

                for i in range(0, len(images), 16):
                    pil = [Image.fromarray(im) for im in images[i : i + 16]]
                    inputs = self.processor(images=pil, return_tensors="pt")
                    feats.append(self.model(**inputs).image_embeds.numpy())
        return np.concatenate(feats)


def frechet_distance(f1: np.ndarray, f2: np.ndarray) -> float:
    """FID between two feature sets (Gaussian approximation)."""
    from scipy import linalg

    mu1, mu2 = f1.mean(0), f2.mean(0)
    s1 = np.cov(f1, rowvar=False)
    s2 = np.cov(f2, rowvar=False)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(s1 @ s2, disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(s1) + np.trace(s2) - 2 * np.trace(covmean))


def main():
    parser = argparse.ArgumentParser("fid eval")
    parser.add_argument("--generated-dir", required=True)
    parser.add_argument("--reference-dir", required=True)
    parser.add_argument("--max-images", type=int, default=None)
    parser.add_argument("--report", type=str, default="fid.json")
    args = parser.parse_args()

    gen = _load_images(args.generated_dir, args.max_images)
    ref = _load_images(args.reference_dir, args.max_images)
    ex = FeatureExtractor()
    fid = frechet_distance(ex.features(gen), ex.features(ref))
    report = {"fid": fid, "extractor": ex.kind, "n_gen": len(gen), "n_ref": len(ref)}
    print(json.dumps(report, indent=2))
    with open(args.report, "w") as f:
        json.dump(report, f)


if __name__ == "__main__":
    main()
