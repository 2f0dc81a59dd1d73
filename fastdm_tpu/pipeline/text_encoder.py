"""Text encoding on the host (CLIP / T5 via transformers, torch CPU).

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
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


class FluxTextEncoder:
    """CLIP-L pooled + T5-XXL sequence embeddings (FLUX/SD3.5-style dual)."""

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

        if isinstance(prompt, str):
            prompt = [prompt]
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
