"""Host-CPU-only generation of the A14B two-expert snapshot used by
a14b_e2e.py (examples/profiling/a14b_e2e.py:100-127). Split out so the
~40-min random-init+quant can run under JAX_PLATFORMS=cpu while the TPU
chip serves other probes; a14b_e2e then loads the snapshot instantly."""
import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax

from fastdm_tpu.models.wan import WanConfig, wan_init_random
from fastdm_tpu.models import snapshot as snap

layers = int(os.environ.get("A14B_LAYERS", 40))
quant = os.environ.get("A14B_QUANT", "int4p")
cache_dir = os.environ.get("A14B_SNAPSHOT", "/root/a14b_experts_snapshot")
cfg = WanConfig(num_layers=layers, quant=quant)
if snap.is_snapshot(cache_dir):
    print("snapshot already present:", cache_dir)
    sys.exit(0)
t0 = time.perf_counter()
params = jax.jit(lambda k: wan_init_random(k, cfg))(jax.random.key(0))
params_2 = jax.jit(lambda k: wan_init_random(k, cfg))(jax.random.key(1))
jax.block_until_ready((params, params_2))
print(f"init: {time.perf_counter()-t0:.1f} s", flush=True)
snap.save_snapshot(cache_dir, {"expert_1": params, "expert_2": params_2},
                   architecture="wan-a14b-bench", quant=quant, cfg=cfg)
print(f"saved {cache_dir}: {time.perf_counter()-t0:.1f} s total", flush=True)
