"""Where the training step's time goes: augmentation vs fwd/bwd vs the rest.

Times, at a given batch size on the real chip (chained-carry fencing):
  pre        : full train_preprocess augmentation stack
  rotate     : the RandomRotate gather alone (at the post-Scale 240x320 res)
  scale      : the Scale(240) resize alone
  fwdbwd     : value_and_grad of loss on preprocessed tensors (no aug)
  step_nopre : full train step with preprocess=False
  step_full  : full train step (preprocess inside, as apps/train.py runs it)

Run: python perf/train_profile.py [encoder] [batch]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(fn, *args, warmup=3, iters=10):
    import jax.numpy as jnp

    carry = jnp.zeros((), jnp.float32)
    for _ in range(warmup):
        carry = fn(*args, carry)
    float(carry)
    carry = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = fn(*args, carry)
    assert np.isfinite(float(carry))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from efficientdepthestimation_tpu.utils.jitcache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from efficientdepthestimation_tpu.apps.common import init_variables
    from efficientdepthestimation_tpu.data.transforms import (
        _rotate_gather,
        _rotate_shear,
        scale_short_side,
        train_preprocess,
    )
    from efficientdepthestimation_tpu.models import build_model
    from efficientdepthestimation_tpu.training.loss import depth_loss

    encoder = sys.argv[1] if len(sys.argv) > 1 else "resnet50"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    model = build_model(encoder, "hu2018")
    variables = init_variables(model, (228, 304), batch=2)
    bf16_vars = jax.device_put(jax.tree_util.tree_map(
        lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v,
        variables))

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    img_u8 = jnp.asarray(rng.integers(0, 256, (batch, 480, 640, 3), dtype=np.uint8))
    dep_u8 = jnp.asarray(rng.integers(10, 250, (batch, 480, 640), dtype=np.uint8))
    images = jnp.asarray(rng.standard_normal((batch, 228, 304, 3)), jnp.bfloat16)
    depths = jnp.asarray(rng.uniform(1, 9, (batch, 114, 152, 1)), jnp.float32)
    scaled = jnp.asarray(rng.standard_normal((batch, 240, 320, 4)), jnp.float32)
    angles = jnp.asarray(rng.uniform(-5, 5, (batch,)), jnp.float32)

    @jax.jit
    def pre_s(im, de, carry):
        i, d = train_preprocess(key, im, de)
        return carry + jnp.sum(i.astype(jnp.float32)) + jnp.sum(d)

    @jax.jit
    def rot_s(x, a, carry):
        return carry + jnp.sum(_rotate_shear(x, a))

    @jax.jit
    def rot_gather_s(x, a, carry):
        return carry + jnp.sum(_rotate_gather(x, a))

    @jax.jit
    def scale_s(im, carry):
        return carry + jnp.sum(scale_short_side(im.astype(jnp.float32), 240,
                                                "bilinear", True))

    @jax.jit
    def fwdbwd_s(v, im, de, carry):
        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                im, True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)})
            return depth_loss(out, de)

        loss, grads = jax.value_and_grad(loss_fn)(v["params"])
        return carry + loss + sum(jnp.sum(g.astype(jnp.float32))
                                  for g in jax.tree_util.tree_leaves(grads)) * 0

    from efficientdepthestimation_tpu.data.transforms import (
        center_crop,
        normalize_imagenet,
    )
    from efficientdepthestimation_tpu.ops.resize import pil_resize

    dep_u8_4d = dep_u8[..., None]

    @jax.jit
    def scale_dep_s(de, carry):
        return carry + jnp.sum(scale_short_side(de.astype(jnp.float32), 240,
                                                "nearest", False))

    @jax.jit
    def flip_s(im, carry):
        f = jax.random.bernoulli(key, 0.5, (im.shape[0],))
        out = jnp.where(f[:, None, None, None], im[:, :, ::-1], im)
        return carry + jnp.sum(out.astype(jnp.float32))

    @jax.jit
    def croptail_s(x, carry):
        de = center_crop(x[..., :1], 228, 304)
        de = pil_resize(de, (114, 152), "bicubic")
        im = center_crop(x[..., 1:], 228, 304)
        im = normalize_imagenet(im / 255.0)
        return carry + jnp.sum(im) + jnp.sum(de)

    rows = {
        "pre": measure(pre_s, img_u8, dep_u8),
        "rotate4": measure(rot_s, scaled, angles),
        "rotate4_gather": measure(rot_gather_s, scaled, angles),
        "scale_img": measure(scale_s, img_u8),
        "scale_dep": measure(scale_dep_s, dep_u8_4d),
        "flip": measure(flip_s, img_u8),
        "croptail": measure(croptail_s, scaled),
        "fwdbwd": measure(fwdbwd_s, bf16_vars, images, depths),
    }
    print(json.dumps({"encoder": encoder, "batch": batch,
                      **{k: round(v, 2) for k, v in rows.items()}}),
          flush=True)


if __name__ == "__main__":
    main()
