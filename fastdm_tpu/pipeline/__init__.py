"""Owned pipeline layer: schedulers, denoise loops, VAE, text encoding.

The reference delegates all of this to diffusers (SURVEY.md §1 note) — the
TPU rebuild owns it so the whole denoise loop can live inside one jitted
lax.scan with on-device caching decisions.
"""
