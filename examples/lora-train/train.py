"""LoRA fine-tuning on the flow-matching objective, TPU-native
(ref: examples/lora-train/qwenimage/train.py — accelerate+peft+torch there;
jax/optax here).

Design: LoRA params mirror the model's stacked QLinear weights as
{down (L, K, r), up (L, r, N)} trees; each step merges them on the fly
(w' = w + s * down@up) and runs the unmodified bf16 core — no module
patching, grads flow only into the LoRA tree. Loss: rectified-flow MSE
(x_t = (1-t) x0 + t eps, target v = eps - x0).

Data: --data-dir of .npz files with arrays {latents (S,C), prompt_embeds
(L,D), pooled (P,)} (precompute with the engine's text/vae encoders), or
--synthetic for a pipeline smoke run.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

# training differentiates through the model; the pallas forward kernels have
# no VJP, so route kernel ops to the jnp backend (XLA differentiates those)
os.environ["FASTDM_KERNEL_BACKEND"] = "jnp"

import jax

if os.environ.get("FASTDM_FORCE_CPU") == "1":
    # the axon plugin ignores JAX_PLATFORMS; only the config knob works
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


LORA_TARGETS = ("qkv", "add_qkv", "to_out", "to_add_out", "proj", "out",
                "proj_mlp", "qkv_mlp")


def init_lora(params, rank, key, scale=1.0):
    """Build a LoRA tree mirroring every targeted 'w' leaf."""
    lora = {}

    def walk(tree, path, out):
        for k, v in tree.items():
            if isinstance(v, dict):
                if "w" in v and k in LORA_TARGETS and v["w"].ndim >= 2:
                    w = v["w"]
                    kd, ku = jax.random.split(jax.random.fold_in(key, hash(path + k) % 2**31))
                    if w.ndim == 3:  # stacked (L, K, N)
                        down = jax.random.normal(kd, (w.shape[0], w.shape[1], rank), jnp.float32) * 0.01
                        up = jnp.zeros((w.shape[0], rank, w.shape[2]), jnp.float32)
                    else:
                        down = jax.random.normal(kd, (w.shape[0], rank), jnp.float32) * 0.01
                        up = jnp.zeros((rank, w.shape[1]), jnp.float32)
                    out[k] = {"down": down, "up": up}
                else:
                    sub = {}
                    walk(v, path + k + ".", sub)
                    if sub:
                        out[k] = sub
        return out

    return walk(params, "", lora)


def merge_lora(params, lora, scale):
    """params with w' = w + scale * down @ up on every LoRA'd leaf."""

    def walk(p, l):
        out = {}
        for k, v in p.items():
            if isinstance(v, dict) and k in l and "down" in l[k]:
                w = v["w"].astype(jnp.float32)
                d, u = l[k]["down"], l[k]["up"]
                delta = jnp.einsum("...kr,...rn->...kn", d, u)
                out[k] = {**v, "w": (w + scale * delta).astype(v["w"].dtype)}
            elif isinstance(v, dict) and k in l:
                out[k] = walk(v, l[k])
            else:
                out[k] = v
        return out

    return walk(params, lora)


def main():
    p = argparse.ArgumentParser("lora train")
    p.add_argument("--architecture", default="flux", choices=["flux", "qwen"])
    p.add_argument("--model-path", default=None, help="checkpoint dir; random if unset")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--rank", type=int, default=16)
    p.add_argument("--lora-scale", type=float, default=1.0)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--layers", type=int, default=None)
    p.add_argument("--output", default="lora_out.safetensors")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import optax

    if args.architecture == "flux":
        from fastdm_tpu.models.flux import (
            FluxConfig, flux_forward, flux_init_random, flux_load, flux_rope_cache,
        )
        from fastdm_tpu.models.loader import TensorSource

        kw = dict(quant=None)  # training runs bf16
        if args.layers:
            kw.update(num_layers=args.layers, num_single_layers=args.layers)
        cfg = FluxConfig(**kw)
        if args.model_path:
            params = flux_load(TensorSource.from_path(
                os.path.join(args.model_path, "transformer")), cfg)
        else:
            params = jax.jit(lambda k: flux_init_random(k, cfg))(jax.random.key(1))
        ht, wt, txt = args.height // 16, args.width // 16, 128
        cos, sin = flux_rope_cache(cfg, txt, ht, wt)

        def model_fn(merged, x_t, t, embeds, pooled):
            g = jnp.full(t.shape, 1.0, jnp.float32)
            return flux_forward(merged, cfg, x_t, embeds, pooled, t, cos, sin, guidance=g)

        data_shapes = dict(
            latents=(ht * wt, cfg.in_channels),
            embeds=(txt, cfg.joint_attention_dim),
            pooled=(cfg.pooled_projection_dim,),
        )
    else:
        raise SystemExit("qwen lora training lands next round")

    lora = init_lora(params, args.rank, jax.random.key(args.seed))
    n_lora = sum(x.size for x in jax.tree.leaves(lora))
    print(f"lora params: {n_lora/1e6:.2f}M (rank {args.rank})")

    tx = optax.adamw(args.lr, weight_decay=0.0)
    opt_state = tx.init(lora)

    def loss_fn(lora, batch, key):
        merged = merge_lora(params, lora, args.lora_scale)
        x0 = batch["latents"]
        eps = jax.random.normal(key, x0.shape, jnp.float32)
        t = jax.random.uniform(jax.random.fold_in(key, 1), (x0.shape[0],))
        x_t = ((1 - t)[:, None, None] * x0 + t[:, None, None] * eps).astype(jnp.bfloat16)
        v_pred = model_fn(
            merged, x_t, t,
            batch["embeds"].astype(jnp.bfloat16),
            batch["pooled"].astype(jnp.bfloat16),
        )
        target = eps - x0
        return jnp.mean((v_pred.astype(jnp.float32) - target) ** 2)

    @jax.jit
    def train_step(lora, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(lora, batch, key)
        updates, opt_state = tx.update(grads, opt_state, lora)
        return optax.apply_updates(lora, updates), opt_state, loss

    def batches():
        rng = np.random.default_rng(args.seed)
        if args.data_dir:
            files = sorted(
                os.path.join(args.data_dir, f)
                for f in os.listdir(args.data_dir) if f.endswith(".npz")
            )
            while True:
                for f in files:
                    d = np.load(f)
                    yield {k: jnp.asarray(d[k])[None] for k in ("latents", "embeds", "pooled")}
        else:
            while True:
                yield {
                    k: jnp.asarray(rng.standard_normal((1, *s)), jnp.float32)
                    for k, s in data_shapes.items()
                }

    it = batches()
    key = jax.random.key(args.seed)
    t0 = time.time()
    for step in range(args.steps):
        key = jax.random.fold_in(key, step)
        lora, opt_state, loss = train_step(lora, opt_state, next(it), key)
        if step % 10 == 0:
            print(f"step {step}: loss {float(loss):.4f} ({time.time()-t0:.0f}s)", flush=True)

    # export in PEFT layout so lora_merge.py / diffusers can consume it
    from safetensors.numpy import save_file

    out = {}

    def export(tree, prefix):
        for k, v in tree.items():
            if "down" in v:
                d = np.asarray(v["down"], np.float32)
                u = np.asarray(v["up"], np.float32)
                if d.ndim == 3:  # unstack layers
                    for li in range(d.shape[0]):
                        # torch Linear layout: lora_A (r, in), lora_B (out, r)
                        out[f"{prefix}{k}.{li}.lora_A.default.weight"] = d[li].T
                        out[f"{prefix}{k}.{li}.lora_B.default.weight"] = u[li].T
                else:
                    out[f"{prefix}{k}.lora_A.default.weight"] = d.T
                    out[f"{prefix}{k}.lora_B.default.weight"] = u.T
            else:
                export(v, f"{prefix}{k}.")

    export(lora, "")
    save_file(out, args.output)
    print(f"wrote {args.output} ({len(out)} tensors)")


if __name__ == "__main__":
    main()
