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


def gaussian_stats(feats: np.ndarray):
    """(mu, sigma) of a feature set — the cacheable half of FID (the
    reference workflow computes the ImageNet-1k reference statistics once;
    re-extracting 50k images of features every run is the expensive part)."""
    return feats.mean(0), np.cov(feats, rowvar=False)


def frechet_from_stats(mu1, s1, mu2, s2) -> float:
    from scipy import linalg

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(s1 @ s2, disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(s1) + np.trace(s2) - 2 * np.trace(covmean))


def frechet_distance(f1: np.ndarray, f2: np.ndarray) -> float:
    """FID between two feature sets (Gaussian approximation)."""
    return frechet_from_stats(*gaussian_stats(f1), *gaussian_stats(f2))


def main():
    parser = argparse.ArgumentParser("fid eval")
    parser.add_argument("--generated-dir", required=True)
    parser.add_argument("--reference-dir", default=None,
                        help="reference image dir (or use --ref-stats)")
    parser.add_argument("--ref-stats", default=None,
                        help="npz of cached reference (mu, sigma); skips "
                             "re-extracting the reference set")
    parser.add_argument("--save-ref-stats", default=None,
                        help="write the reference (mu, sigma) npz for reuse")
    parser.add_argument("--max-images", type=int, default=None)
    parser.add_argument("--report", type=str, default="fid.json")
    args = parser.parse_args()

    ex = FeatureExtractor()
    n_ref = None
    if args.ref_stats:
        # cached statistics: the ImageNet-style reference set is extracted
        # ONCE (ref workflow: 50k images), then every config reuses the npz
        z = np.load(args.ref_stats)
        mu_r, s_r = z["mu"], z["sigma"]
        if str(z.get("extractor")) not in ("None", ex.kind):
            raise SystemExit(
                f"cached stats were extracted with {z['extractor']}, this "
                f"run uses {ex.kind} — FID is only comparable within one "
                "extractor")
    elif args.reference_dir:
        ref = _load_images(args.reference_dir, args.max_images)
        n_ref = len(ref)
        mu_r, s_r = gaussian_stats(ex.features(ref))
        if args.save_ref_stats:
            np.savez(args.save_ref_stats, mu=mu_r, sigma=s_r,
                     extractor=ex.kind, n=n_ref)
    else:
        raise SystemExit("provide --reference-dir or --ref-stats")

    gen = _load_images(args.generated_dir, args.max_images)
    mu_g, s_g = gaussian_stats(ex.features(gen))
    fid = frechet_from_stats(mu_g, s_g, mu_r, s_r)
    report = {"fid": fid, "extractor": ex.kind, "n_gen": len(gen),
              "n_ref": n_ref, "ref_stats": args.ref_stats}
    print(json.dumps(report, indent=2))
    with open(args.report, "w") as f:
        json.dump(report, f)


if __name__ == "__main__":
    main()
