"""Root-cause the ~8% trained-vs-random throughput gap on the baked path.

Round 3 measured the baked ENB0-HU pipeline at 3759 fps with random-init
weights but 3473 fps with the trained checkpoint
(perf/trained_weights_bench.json) and guessed at constant-folding effects.
Hypothesis to isolate: a FRESH init's BatchNorm constants are exact
identities (scale=1, bias=0, mean=0, var=1) — with baked weights XLA's
algebraic simplifier deletes those activation-side multiply/adds outright,
while any trained (or merely perturbed) BN constants leave real elementwise
work behind. If that is the cause, "random init + epsilon noise on the BN
leaves" must be as slow as the trained checkpoint.

Variants (all through the identical baked b128 serving pipeline):
  random        — model.init as benched in r3 (identity BN constants)
  random+bnoise — the same tree, BN scale/bias/mean/var perturbed by 1e-3
                  (kills exact-identity folding, keeps every other property
                  of the random tree: same shapes, same magnitudes)
  random+noise  — every leaf perturbed (controls for non-BN folding)
  trained       — the committed synthetic-NYU trained checkpoint

Run: python perf/trained_gap_bisect.py   (writes trained_gap_bisect.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from efficientdepthestimation_tpu.utils.jitcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from efficientdepthestimation_tpu.apps.common import init_variables
from efficientdepthestimation_tpu.data.transforms import eval_preprocess_image_only
from efficientdepthestimation_tpu.models import build_model
from efficientdepthestimation_tpu.ops.resize import resize_bilinear_align_corners

BATCH = int(os.environ.get("BATCH", "128"))
ITERS = 10
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRAINED = os.path.join(REPO, "e2e", "ENB0-HU-synthetic.ede")


def to_bf16(tree):
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x).astype(jnp.bfloat16)
        if np.asarray(x).dtype == np.float32 else np.asarray(x), tree)


def perturb(tree, *, bn_only: bool, eps=1e-3, seed=0):
    """Add uniform(+eps/2, +eps) noise so no leaf keeps exact 0/1 values.

    ``bn_only=True`` touches only BatchNorm params + batch_stats (the
    scale/bias/mean/var leaves); everything else stays bit-identical to the
    fresh init."""
    rng = np.random.default_rng(seed)
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for path, leaf in flat:
        keys = "/".join(str(p) for p in path).lower()
        is_bn = ("batch_stats" in keys or "bn" in keys or "norm" in keys
                 or "scale" in keys)
        arr = np.asarray(leaf)
        if (is_bn or not bn_only) and arr.dtype in (np.float32, np.float64):
            arr = arr + rng.uniform(eps / 2, eps, arr.shape).astype(arr.dtype)
        out.append(arr)
    return jax.tree_util.tree_unflatten(treedef, out)


def bench(model, variables):
    baked = jax.device_put(to_bf16(variables))

    @jax.jit
    def live(frames_u8):
        images = eval_preprocess_image_only(frames_u8).astype(jnp.bfloat16)
        depth = model.apply(baked, images).astype(jnp.float32)
        return resize_bilinear_align_corners(depth, (480, 640))

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, (BATCH, 480, 640, 3), dtype=np.uint8))
    out = live(frames)
    for _ in range(3):
        out = live(frames)
    jax.block_until_ready(out)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for _ in range(ITERS):
        acc = acc + jnp.sum(live(frames))
    assert np.isfinite(float(acc))
    return BATCH * ITERS / (time.perf_counter() - t0)


def main():
    print("platform:", jax.default_backend(), jax.devices(), flush=True)
    model = build_model("efficientnet-b0", "hu2018")
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        random_tree = init_variables(model, (228, 304), batch=1)
    random_tree = jax.tree_util.tree_map(np.asarray, random_tree)

    variants = {
        "random": random_tree,
        "random+bnoise": perturb(random_tree, bn_only=True),
        "random+noise": perturb(random_tree, bn_only=False),
    }
    if os.path.isfile(TRAINED):
        from efficientdepthestimation_tpu.apps.common import load_any_checkpoint

        _, trained = load_any_checkpoint(TRAINED)
        variants["trained"] = jax.tree_util.tree_map(np.asarray, trained)
    else:
        print(f"trained checkpoint absent ({TRAINED}); skipping", flush=True)

    results = {}
    for name, tree in variants.items():
        fps = bench(model, tree)
        results[name] = round(fps, 1)
        print(f"{name:>14}: {fps:8.1f} fps", flush=True)

    rec = {"batch": BATCH, "iters": ITERS, "fps": results}
    if "trained" in results:
        rec["gap_trained_vs_random_pct"] = round(
            100 * (1 - results["trained"] / results["random"]), 2)
        rec["gap_bnoise_vs_random_pct"] = round(
            100 * (1 - results["random+bnoise"] / results["random"]), 2)
    print(json.dumps(rec))
    with open(os.path.join(os.path.dirname(__file__),
                           "trained_gap_bisect.json"), "w") as f:
        json.dump(rec, f, indent=2)


if __name__ == "__main__":
    main()
