"""Is the 3476-vs-1400 gap the serving path or the per-call sum dispatches?"""
import os, time, json
from efficientdepthestimation_tpu.utils.jitcache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp, numpy as np
from efficientdepthestimation_tpu.apps.common import load_any_checkpoint, make_serving_fn

BATCH, ITERS = 128, 10
rng = np.random.default_rng(0)
frames = jnp.asarray(rng.integers(0, 256, (BATCH, 480, 640, 3), dtype=np.uint8))
model, variables = load_any_checkpoint("e2e/ENB0-HU-synthetic.ede")
serve = make_serving_fn(model, variables, batch_hint=BATCH, upsample_to=(480, 640),
                        dtype=jnp.bfloat16, preprocess=True)

# A: per-call outputs + separate sums (the slow new-bench shape)
outs = [serve(frames) for _ in range(4)]
float(jnp.stack([jnp.sum(o) for o in outs]).sum())
t0 = time.perf_counter()
outs = [serve(frames) for _ in range(ITERS)]
float(jnp.stack([jnp.sum(o) for o in outs]).sum())
fps_a = BATCH * ITERS / (time.perf_counter() - t0)

# B: checksum fused into one outer jit, carry chained as an argument
@jax.jit
def step(frames, carry):
    return carry + jnp.sum(serve(frames))
carry = jnp.zeros((), jnp.float32)
for _ in range(4):
    carry = step(frames, carry)
float(carry)
carry = jnp.zeros((), jnp.float32)
t0 = time.perf_counter()
for _ in range(ITERS):
    carry = step(frames, carry)
float(carry)
fps_b = BATCH * ITERS / (time.perf_counter() - t0)
print(json.dumps({"per_call_sums_fps": round(fps_a, 1),
                  "fused_checksum_fps": round(fps_b, 1)}))
