"""Follow-up to super_gather_residual.py: the split showed scatter premium
~= 0 and the whole residual (123 ms at the A14B shape) is per-iteration grid
constants. The one lever that amortizes a per-q-block constant is a larger
q-block: bq512 halves the grid's q-iterations (296 -> 148) at the cost of a
somewhat denser fetch (each 512-row band unions two 256-row radial bands).
This A/Bs bq256 vs bq512 (x slots 2/4) with tables rebuilt per bq, reporting
fetched density alongside, so the ship/close decision (>= 2.2x over dense)
is made on measurements."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fastdm_tpu.utils.profiling import enable_compilation_cache

N_ITER = int(os.environ.get("SG_ITERS", 5))
REPS = 3
B, S, H, HD = 1, 75600, 40, 128
FINE, SB = 64, 4
T_DENSE_MS = 751.2  # same-session dense flash (super_gather_residual.py)


def timeit(fn, args, tag):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / N_ITER
    print(f"{tag:38s} {per * 1e3:9.1f} ms/layer-attn "
          f"({T_DENSE_MS / (per * 1e3):.2f}x vs dense)", flush=True)
    return per


def ingraph(attn_fn):
    @jax.jit
    def run(qs, k, v):
        def body(c, q):
            o = attn_fn(q, k, v)
            return jnp.maximum(c, jnp.max(o.astype(jnp.float32))), None
        c, _ = jax.lax.scan(body, jnp.float32(0), qs)
        return c
    return run


def main():
    enable_compilation_cache()
    from fastdm_tpu.kernels.ops import gather_super_attention
    from fastdm_tpu.sparse.config import RadialAttnConfig
    from fastdm_tpu.sparse.xsparse import RadialAttn

    print(f"devices: {jax.devices()}", flush=True)
    sp = RadialAttn(RadialAttnConfig(block_size=64, decay_factor=0.2,
                                     model_type="wan"))
    sp.post_init(video_token_num=S, num_frame=21)

    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    qs = jax.random.normal(k1, (N_ITER, B, S, H * HD), jnp.bfloat16)
    k = jax.random.normal(k2, (B, S, H * HD), jnp.bfloat16)
    v = jax.random.normal(k3, (B, S, H * HD), jnp.bfloat16)

    for bq, grp in ((256, 32), (512, 32), (512, 64)):
        idx, val, rows = sp.block_lists_super(bq, grp // SB, SB)
        dens = rows[:, 1].sum() * SB / (rows.shape[0] * (-(-S // FINE)))
        print(f"-- bq{bq} grp{grp}: {idx.shape[0]} entries, fetched density "
              f"{dens:.3f} (ideal {T_DENSE_MS * dens:.0f} ms)", flush=True)
        i, vl, r = jnp.asarray(idx), jnp.asarray(val), jnp.asarray(rows)
        for slots in (2, 4):
            try:
                timeit(ingraph(
                    lambda q, kk, vv, i=i, vl=vl, r=r, bq=bq, grp=grp,
                           slots=slots: gather_super_attention(
                        q, kk, vv, i, vl, r, H, H, HD, scale=HD**-0.5,
                        block_q=bq, group=grp // SB, fine=FINE,
                        superblock=SB, slots=slots)),
                    (qs, k, v), f"bq{bq} grp{grp} slots={slots}")
            except Exception as e:
                print(f"bq{bq} grp{grp} slots={slots}: "
                      f"{type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
