"""fastdm_tpu — a TPU-native text-to-image / text-to-video diffusion inference engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of KE-AI-ENG/FastDM
(reference layout documented in SURVEY.md). The compute path is pure-functional
JAX over parameter pytrees; hot ops dispatch through a kernel registry with a
pure-XLA ``jnp`` backend (numerical oracle) and a ``pallas`` TPU-kernel backend.

Layering (mirrors SURVEY.md §1):
  kernels/   — op registry + jnp/pallas backends       (ref: fastdm/kernel/)
  layers/    — quantized NN building blocks            (ref: fastdm/layer/)
  models/    — model cores as config + pure forward    (ref: fastdm/model/)
  caching/   — TeaCache / FBCache / DiCache            (ref: fastdm/caching/)
  sparse/    — radial block-sparse attention           (ref: fastdm/sparse/)
  pipeline/  — schedulers, VAE, denoise loop (owned here; ref rides diffusers)
  parallel/  — device mesh + sharding rules (new surface; ref is single-GPU)
  engine.py  — FastDMEngine-compatible user API        (ref: fastdm/model_entry.py)
"""

__version__ = "0.1.0"
