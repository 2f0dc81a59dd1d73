"""Text encoding on the host (CLIP / T5 / UMT5 / Qwen2.5-VL via transformers,
torch CPU).

TPU-native stance on the reference's `--oom-resolve` (ref:
fastdm/model_entry.py:697-717): text encoders ALWAYS live on the host CPU —
they run once per prompt, off the device critical path, and their outputs
(a few MB of embeddings) are the only device transfer. No monkeypatching.

Everything is lazy: transformers/torch are only imported when a prompt is
actually encoded, so the engine works without them when callers pass
precomputed embeddings (profiling, serving with an embedding cache).
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from fastdm_tpu.utils.logging import logger


def _as_list(prompt) -> List[str]:
    return [prompt] if isinstance(prompt, str) else list(prompt)


class FluxTextEncoder:
    """CLIP-L pooled + T5-XXL sequence embeddings (FLUX)."""

    def __init__(self, model_path: str, max_sequence_length: int = 512):
        self.model_path = model_path
        self.max_sequence_length = max_sequence_length
        self._loaded = False

    def _load(self):
        if self._loaded:
            return
        import torch
        from transformers import (
            CLIPTextModel,
            CLIPTokenizer,
            T5EncoderModel,
            T5TokenizerFast,
        )

        mp = self.model_path
        self.tokenizer = CLIPTokenizer.from_pretrained(os.path.join(mp, "tokenizer"))
        self.text_encoder = CLIPTextModel.from_pretrained(
            os.path.join(mp, "text_encoder"), torch_dtype=torch.float32
        )
        self.tokenizer_2 = T5TokenizerFast.from_pretrained(os.path.join(mp, "tokenizer_2"))
        self.text_encoder_2 = T5EncoderModel.from_pretrained(
            os.path.join(mp, "text_encoder_2"), torch_dtype=torch.float32
        )
        self._loaded = True

    def encode(self, prompt, num_images_per_prompt: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (prompt_embeds (B, L, 4096), pooled (B, 768)) as bf16."""
        self._load()
        import torch

        prompt = _as_list(prompt)
        with torch.no_grad():
            clip_in = self.tokenizer(
                prompt, padding="max_length", max_length=77, truncation=True,
                return_tensors="pt",
            )
            pooled = self.text_encoder(clip_in.input_ids, output_hidden_states=False).pooler_output
            t5_in = self.tokenizer_2(
                prompt, padding="max_length", max_length=self.max_sequence_length,
                truncation=True, return_tensors="pt",
            )
            embeds = self.text_encoder_2(t5_in.input_ids)[0]
        embeds = np.repeat(np.asarray(embeds, np.float32), num_images_per_prompt, 0)
        pooled = np.repeat(np.asarray(pooled, np.float32), num_images_per_prompt, 0)
        return jnp.asarray(embeds, jnp.bfloat16), jnp.asarray(pooled, jnp.bfloat16)


class SDXLTextEncoder:
    """Dual CLIP (L + bigG): per-token concat embeds (2048) + bigG pooled (1280)."""

    def __init__(self, model_path: str):
        self.model_path = model_path
        self._loaded = False

    def _load(self):
        if self._loaded:
            return
        import torch
        from transformers import CLIPTextModel, CLIPTextModelWithProjection, CLIPTokenizer

        mp = self.model_path
        self.tokenizer = CLIPTokenizer.from_pretrained(os.path.join(mp, "tokenizer"))
        self.text_encoder = CLIPTextModel.from_pretrained(
            os.path.join(mp, "text_encoder"), torch_dtype=torch.float32
        )
        self.tokenizer_2 = CLIPTokenizer.from_pretrained(os.path.join(mp, "tokenizer_2"))
        self.text_encoder_2 = CLIPTextModelWithProjection.from_pretrained(
            os.path.join(mp, "text_encoder_2"), torch_dtype=torch.float32
        )
        self._loaded = True

    def encode(self, prompt, num_images_per_prompt: int = 1):
        """Returns (prompt_embeds (B, 77, 2048), pooled (B, 1280))."""
        self._load()
        import torch

        prompt = _as_list(prompt)
        with torch.no_grad():
            ids1 = self.tokenizer(prompt, padding="max_length", max_length=77,
                                  truncation=True, return_tensors="pt").input_ids
            out1 = self.text_encoder(ids1, output_hidden_states=True)
            emb1 = out1.hidden_states[-2]  # penultimate layer (SDXL convention)
            ids2 = self.tokenizer_2(prompt, padding="max_length", max_length=77,
                                    truncation=True, return_tensors="pt").input_ids
            out2 = self.text_encoder_2(ids2, output_hidden_states=True)
            emb2 = out2.hidden_states[-2]
            pooled = out2.text_embeds
        embeds = np.concatenate(
            [np.asarray(emb1, np.float32), np.asarray(emb2, np.float32)], axis=-1
        )
        embeds = np.repeat(embeds, num_images_per_prompt, 0)
        pooled = np.repeat(np.asarray(pooled, np.float32), num_images_per_prompt, 0)
        return jnp.asarray(embeds, jnp.bfloat16), jnp.asarray(pooled, jnp.bfloat16)


class SD3TextEncoder:
    """Triple encoder: CLIP-L + CLIP-bigG (pooled concat 2048) + T5 (4096).

    Per-token embeds: [clip_l ; clip_bigG] padded to 4096, then concat with T5
    along the sequence (diffusers SD3 convention)."""

    def __init__(self, model_path: str, max_sequence_length: int = 256):
        self.model_path = model_path
        self.max_sequence_length = max_sequence_length
        self._loaded = False

    def _load(self):
        if self._loaded:
            return
        import torch
        from transformers import (
            CLIPTextModelWithProjection,
            CLIPTokenizer,
            T5EncoderModel,
            T5TokenizerFast,
        )

        mp = self.model_path
        self.tokenizer = CLIPTokenizer.from_pretrained(os.path.join(mp, "tokenizer"))
        self.text_encoder = CLIPTextModelWithProjection.from_pretrained(
            os.path.join(mp, "text_encoder"), torch_dtype=torch.float32
        )
        self.tokenizer_2 = CLIPTokenizer.from_pretrained(os.path.join(mp, "tokenizer_2"))
        self.text_encoder_2 = CLIPTextModelWithProjection.from_pretrained(
            os.path.join(mp, "text_encoder_2"), torch_dtype=torch.float32
        )
        self.tokenizer_3 = T5TokenizerFast.from_pretrained(os.path.join(mp, "tokenizer_3"))
        self.text_encoder_3 = T5EncoderModel.from_pretrained(
            os.path.join(mp, "text_encoder_3"), torch_dtype=torch.float32
        )
        self._loaded = True

    def encode(self, prompt, num_images_per_prompt: int = 1):
        self._load()
        import torch

        prompt = _as_list(prompt)
        with torch.no_grad():
            def clip(tok, enc):
                ids = tok(prompt, padding="max_length", max_length=77,
                          truncation=True, return_tensors="pt").input_ids
                out = enc(ids, output_hidden_states=True)
                return np.asarray(out.hidden_states[-2], np.float32), np.asarray(
                    out.text_embeds, np.float32
                )

            e1, p1 = clip(self.tokenizer, self.text_encoder)
            e2, p2 = clip(self.tokenizer_2, self.text_encoder_2)
            t5_ids = self.tokenizer_3(
                prompt, padding="max_length", max_length=self.max_sequence_length,
                truncation=True, return_tensors="pt",
            ).input_ids
            e3 = np.asarray(self.text_encoder_3(t5_ids)[0], np.float32)
        clip_cat = np.concatenate([e1, e2], axis=-1)
        clip_cat = np.pad(clip_cat, ((0, 0), (0, 0), (0, e3.shape[-1] - clip_cat.shape[-1])))
        embeds = np.concatenate([clip_cat, e3], axis=1)
        pooled = np.concatenate([p1, p2], axis=-1)
        embeds = np.repeat(embeds, num_images_per_prompt, 0)
        pooled = np.repeat(pooled, num_images_per_prompt, 0)
        return jnp.asarray(embeds, jnp.bfloat16), jnp.asarray(pooled, jnp.bfloat16)


class WanTextEncoder:
    """UMT5-XXL sequence embeddings, fixed 512-token context (Wan)."""

    def __init__(self, model_path: str, text_len: int = 512):
        self.model_path = model_path
        self.text_len = text_len
        self._loaded = False

    def _load(self):
        if self._loaded:
            return
        import torch
        from transformers import AutoTokenizer, UMT5EncoderModel

        mp = self.model_path
        self.tokenizer = AutoTokenizer.from_pretrained(os.path.join(mp, "tokenizer"))
        self.text_encoder = UMT5EncoderModel.from_pretrained(
            os.path.join(mp, "text_encoder"), torch_dtype=torch.float32
        )
        self._loaded = True

    def encode(self, prompt, num_videos_per_prompt: int = 1):
        self._load()
        import torch

        prompt = _as_list(prompt)
        with torch.no_grad():
            ids = self.tokenizer(
                prompt, padding="max_length", max_length=self.text_len,
                truncation=True, return_tensors="pt",
            )
            embeds = self.text_encoder(ids.input_ids, attention_mask=ids.attention_mask)[0]
            # zero out padding (wan convention: masked positions contribute zeros)
            embeds = embeds * ids.attention_mask[..., None]
        embeds = np.repeat(np.asarray(embeds, np.float32), num_videos_per_prompt, 0)
        return jnp.asarray(embeds, jnp.bfloat16)


class QwenImageTextEncoder:
    """Qwen2.5-VL text tower (Qwen-Image). Heavy (7B) — host CPU, lazy."""

    PROMPT_TEMPLATE = (
        "<|im_start|>system\nDescribe the image by detailing the color, shape, "
        "size, texture, quantity, text, spatial relationships of the objects "
        "and background:<|im_end|>\n<|im_start|>user\n{}<|im_end|>\n"
        "<|im_start|>assistant\n"
    )
    DROP_IDX = 34  # template prefix tokens dropped from the embedding

    def __init__(self, model_path: str, max_sequence_length: int = 1024):
        self.model_path = model_path
        self.max_sequence_length = max_sequence_length
        self._loaded = False

    def _load(self):
        if self._loaded:
            return
        import torch
        from transformers import AutoModelForCausalLM, AutoTokenizer

        mp = self.model_path
        self.tokenizer = AutoTokenizer.from_pretrained(os.path.join(mp, "tokenizer"))
        try:
            # real Qwen-Image checkpoints ship a Qwen2.5-VL text encoder,
            # which is NOT in the causal-LM auto-mapping — Vision2Seq first
            from transformers import AutoModelForVision2Seq

            self.text_encoder = AutoModelForVision2Seq.from_pretrained(
                os.path.join(mp, "text_encoder"), torch_dtype=torch.float32
            )
        except Exception:
            self.text_encoder = AutoModelForCausalLM.from_pretrained(
                os.path.join(mp, "text_encoder"), torch_dtype=torch.float32
            )
        self._loaded = True

    def encode(self, prompt, num_images_per_prompt: int = 1):
        self._load()
        import torch

        prompts = [self.PROMPT_TEMPLATE.format(p) for p in _as_list(prompt)]
        with torch.no_grad():
            ids = self.tokenizer(
                prompts, padding=True, truncation=True,
                max_length=self.max_sequence_length + self.DROP_IDX,
                return_tensors="pt",
            )
            out = self.text_encoder(
                ids.input_ids, attention_mask=ids.attention_mask,
                output_hidden_states=True,
            )
            # diffusers' encode_prompt zero-pads each prompt's embeds past
            # its own valid length; the DiT attends unmasked (the reference
            # drops the text mask in forward_qwen), so pad positions must be
            # ZEROS, not raw pad-token hidden states
            hidden = out.hidden_states[-1] * ids.attention_mask[..., None]
            hidden = hidden[:, self.DROP_IDX :]
        embeds = np.repeat(np.asarray(hidden, np.float32), num_images_per_prompt, 0)
        return jnp.asarray(embeds, jnp.bfloat16)

    # qwen-image-edit: the VL tower also sees the source image
    # (diffusers QwenImageEditPipeline template; vision tokens precede text)
    EDIT_TEMPLATE = (
        "<|im_start|>system\nDescribe the key features of the input image "
        "(color, shape, size, texture, objects, background), then explain how "
        "the user's text instruction should alter or modify the image. Generate "
        "a new image that meets the user's requirements while maintaining "
        "consistency with the original input where appropriate.<|im_end|>\n"
        "<|im_start|>user\n<|vision_start|><|image_pad|><|vision_end|>"
        "{}<|im_end|>\n<|im_start|>assistant\n"
    )
    EDIT_DROP_IDX = 64

    def encode_with_image(self, prompt, image, num_images_per_prompt: int = 1):
        """Vision-conditioned prompt embedding. image: (H, W, 3) uint8 or a
        list of them (multi-image edit: each gets a 'Picture {i}:' vision
        block, the QwenImageEditPlus template convention). Falls back to
        text-only encoding if the checkpoint lacks the vision tower (e.g. a
        plain Qwen-Image text_encoder dir)."""
        self._load()
        import torch

        images = list(image) if isinstance(image, (list, tuple)) else [image]
        if not hasattr(self, "_vl"):
            try:
                from transformers import AutoProcessor, AutoModelForVision2Seq

                mp = self.model_path
                self._vl_processor = AutoProcessor.from_pretrained(
                    os.path.join(mp, "processor")
                )
                self._vl = AutoModelForVision2Seq.from_pretrained(
                    os.path.join(mp, "text_encoder"), torch_dtype=torch.float32
                )
            except Exception as e:
                self._vl = None  # cache the failure — don't rescan per call
                logger.warning(
                    "qwen-edit: no vision tower (%s); text-only conditioning", e)
        if self._vl is None:
            return self.encode(prompt, num_images_per_prompt)

        vision = "<|vision_start|><|image_pad|><|vision_end|>"
        if len(images) == 1:
            user_prefix = vision
        else:
            user_prefix = "".join(
                f"Picture {i + 1}: {vision}" for i in range(len(images))
            )
        template = self.EDIT_TEMPLATE.replace(
            "<|im_start|>user\n" + vision, "<|im_start|>user\n" + user_prefix
        )
        prompts = [template.format(p) for p in _as_list(prompt)]
        with torch.no_grad():
            inputs = self._vl_processor(
                text=prompts, images=images * len(prompts), return_tensors="pt",
                padding=True,
            )
            out = self._vl(**inputs, output_hidden_states=True)
            hidden = out.hidden_states[-1][:, self.EDIT_DROP_IDX :]
        embeds = np.repeat(np.asarray(hidden, np.float32), num_images_per_prompt, 0)
        return jnp.asarray(embeds, jnp.bfloat16)


class CLIPImageEncoder:
    """CLIP vision tower for IP-Adapter image conditioning (host CPU, lazy).
    Loads from <model_path>/image_encoder (diffusers layout) or a standalone
    CLIPVisionModelWithProjection directory."""

    def __init__(self, path: str):
        self.path = path
        self._loaded = False

    def _load(self):
        if self._loaded:
            return
        import torch
        from transformers import CLIPImageProcessor, CLIPVisionModelWithProjection

        self.model = CLIPVisionModelWithProjection.from_pretrained(
            self.path, torch_dtype=torch.float32
        )
        try:  # ship-alongside preprocessor config when present
            self.processor = CLIPImageProcessor.from_pretrained(self.path)
        except Exception:
            s = self.model.config.image_size
            self.processor = CLIPImageProcessor(
                size={"shortest_edge": s}, crop_size={"height": s, "width": s}
            )
        self._loaded = True

    def encode(self, image, num_images_per_prompt: int = 1,
               hidden_states: bool = False):
        """image: (H, W, 3) uint8 -> (N, embed_dim) projected CLIP embedding,
        or (N, S, hidden_dim) penultimate-layer tokens when hidden_states=True
        (IP-Adapter-Plus conditions on these, not the pooled projection)."""
        self._load()
        import torch

        inputs = self.processor(images=image, return_tensors="pt")
        with torch.no_grad():
            out = self.model(**inputs, output_hidden_states=hidden_states)
            emb_t = out.hidden_states[-2] if hidden_states else out.image_embeds
        emb = np.repeat(np.asarray(emb_t, np.float32), num_images_per_prompt, 0)
        return jnp.asarray(emb, jnp.bfloat16)
