"""On-device serving autotuner: measure every serving variant, cache the winner.

``make_serving_fn``'s built-in policy encodes numbers measured on one v5e
chip (PERFORMANCE.md). Other topologies — new TPU generations, different
HBM/VMEM ratios, CPU dev boxes — can rank the serving paths differently, and
hand-porting the policy table is exactly the kind of guesswork this repo's
perf methodology exists to avoid. ``autotune_serving`` measures every
applicable (path × depthwise-lowering) candidate ON THE CURRENT DEVICE with
the repo's honest timing (post-window fetch of a scalar checksum of every
output — ``block_until_ready`` alone does not fence completion through the
axon tunnel) and caches the winner in a JSON policy file keyed by
(device kind, model, batch, dtype). ``make_serving_fn(policy_path=...)``
then dispatches from the cache, falling back to the built-in heuristic for
unmeasured keys.

Candidates mirror the serving factories (apps/common.py):
  * monolithic        — one jit program (``make_infer_fn``)
  * staged            — encoder → D → MFF → R chained jits (Hu models only)
  * tiled / tiled-staged — batch-tiled over the base (batch > tile only)
× depthwise lowerings xla / shift / pallas (EfficientNet encoders only)
× constant-baked weights (``+bake``, xla lowering only — weights embedded
  as compile-time constants; fastest fixed-checkpoint path on v5e).

CLI:  python -m efficientdepthestimation_tpu.apps.autotune \
          --encoder efficientnet-b0 --decoder hu2018 --batch 128 --bf16
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from efficientdepthestimation_tpu.apps.common import (
    _efficientnet_variant,
    make_infer_fn,
    make_staged_infer_fn,
    make_tiled_infer_fn,
)

__all__ = ["autotune_serving", "autotune_train", "load_policy", "policy_key",
           "train_policy_key", "apply_train_policy", "DEFAULT_POLICY_PATH",
           "TRAIN_POLICY_PATH"]

DEFAULT_POLICY_PATH = os.path.join("runs", "serving_policy.json")
TRAIN_POLICY_PATH = os.path.join("runs", "train_policy.json")
TILE_BATCH = 128


def _model_id(model) -> str:
    """Stable identity string: decoder class + encoder variant."""
    fac = getattr(model, "encoder_factory", None)
    enc = None
    if fac is not None:
        kw = getattr(fac, "keywords", None) or {}
        enc = kw.get("variant") or getattr(
            getattr(fac, "func", fac), "__name__", None)
    return f"{type(model).__name__}:{enc or 'unknown'}"


def policy_key(model, batch: int, dtype) -> str:
    device_kind = jax.devices()[0].device_kind.replace(" ", "_")
    dt = jnp.dtype(dtype).name if dtype is not None else "float32"
    return f"{device_kind}|{_model_id(model)}|b{batch}|{dt}"


def load_policy(path: str = DEFAULT_POLICY_PATH) -> dict:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _serving_candidates(model, batch: int, int8: bool = False):
    """(name, builder_kwargs) for every path×lowering valid for this model.

    ``int8=True`` additionally measures dynamic-int8 variants of every path
    (xla depthwise lowering only) — numerics-changing, so they only enter
    the candidate set on explicit request (``--int8``); the winning entry
    records the flag and the measured output delta vs the float path.
    """
    from efficientdepthestimation_tpu.models.hu2018 import HuDepthModel

    dws = ["xla"]
    if _efficientnet_variant(model) is not None:
        dws += ["shift", "pallas"]
    is_hu = isinstance(model, HuDepthModel)

    cands = []
    for dw in dws:
        cands.append((f"monolithic/{dw}", dict(path="monolithic", dw_impl=dw)))
        if is_hu:
            cands.append((f"staged/{dw}", dict(path="staged", dw_impl=dw)))
        if batch > TILE_BATCH:
            cands.append((f"tiled/{dw}", dict(path="tiled", dw_impl=dw)))
            if is_hu:
                cands.append((f"tiled-staged/{dw}",
                              dict(path="tiled-staged", dw_impl=dw)))
    # Constant-baked weights (bake_weights=True) compose with every path;
    # measured 1.4-1.7× on v5e (perf/bake_sweep_*.json). Like int8, only the
    # default xla lowering gets the extra variants to bound compile cost.
    for name, spec in list(cands):
        if spec["dw_impl"] == "xla":
            cands.append((f"{name}+bake", dict(spec, bake_weights=True)))
    if int8:
        for name, spec in list(cands):
            if spec["dw_impl"] == "xla":
                cands.append((f"{name}+int8", dict(spec, int8=True)))
    return cands


def build_serving_candidate(model, variables, spec: dict, *,
                            upsample_to=None, dtype=None, preprocess=False):
    path, dw = spec["path"], spec["dw_impl"]
    int8 = bool(spec.get("int8", False))
    bake = bool(spec.get("bake_weights", False))
    if path == "monolithic":
        return make_infer_fn(model, variables, upsample_to=upsample_to,
                             dtype=dtype, dw_impl=dw, int8=int8,
                             bake_weights=bake, preprocess=preprocess)
    if path == "staged":
        return make_staged_infer_fn(model, variables, upsample_to=upsample_to,
                                    dtype=dtype, dw_impl=dw, int8=int8,
                                    bake_weights=bake, preprocess=preprocess)
    if path == "tiled":
        return make_tiled_infer_fn(model, variables, staged=False,
                                   tile_batch=TILE_BATCH,
                                   upsample_to=upsample_to, dtype=dtype,
                                   dw_impl=dw, int8=int8, bake_weights=bake,
                                   preprocess=preprocess)
    if path == "tiled-staged":
        return make_tiled_infer_fn(model, variables, staged=True,
                                   tile_batch=TILE_BATCH,
                                   upsample_to=upsample_to, dtype=dtype,
                                   dw_impl=dw, int8=int8, bake_weights=bake,
                                   preprocess=preprocess)
    raise ValueError(f"unknown serving path {path!r}")


def _timed_fps(fn, images, batch: int, *, warmup: int = 2, iters: int = 5):
    """Throughput with forced completion and MINIMAL extra dispatches.

    The timing window closes on a host fetch of a scalar of the LAST call's
    output: a TPU executes its programs in dispatch order on one stream, so
    that fetch forces completion of every earlier call too. Dispatching a
    separate ``jnp.sum`` between candidate calls (the round-2..4 shape)
    adds per-call transport latency that penalizes multi-program candidates
    (staged = 4 dispatches/call, tiled = N) more than monolithic ones —
    measured ~60 ms/dispatch on a degraded-tunnel day (bench.py A/B),
    enough to flip rankings. Finiteness is asserted with sums dispatched
    AFTER the window closes."""
    out = fn(images)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = fn(images)
    float(jnp.sum(out))  # fence: warmup complete before the window

    t0 = time.perf_counter()
    outs = [fn(images) for _ in range(iters)]
    float(jnp.sum(outs[-1]))  # in-order execution closes the window
    dt = time.perf_counter() - t0
    checksum = float(jnp.stack([jnp.sum(o) for o in outs]).sum())
    if not np.isfinite(checksum):
        raise FloatingPointError(f"non-finite serving output ({checksum})")
    return batch * iters / dt


def autotune_serving(model, variables, batch: int, *, crop_hw=(228, 304),
                     upsample_to=None, dtype=None,
                     policy_path: Optional[str] = DEFAULT_POLICY_PATH,
                     warmup: int = 2, iters: int = 5, verbose: bool = True,
                     int8: bool = False):
    """Measure all candidates, cache the winner, return (fn, policy_entry).

    Measurement inputs are generated ON DEVICE (host→device uploads through
    the tunnel run at ~MB/s; a big ``jnp.asarray`` upload would dominate).
    """
    h, w = crop_hw
    # f32 inputs — what the production preprocess feeds the serving fns
    # (each fn casts internally when dtype=bf16), so the measured program is
    # the production program.
    images = jax.jit(
        lambda k: jax.random.normal(k, (batch, h, w, 3), jnp.float32)
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(images)

    # reference output for the int8 accuracy delta (float monolithic path)
    ref_out = None
    if int8:
        ref_fn = build_serving_candidate(
            model, variables, {"path": "monolithic", "dw_impl": "xla"},
            upsample_to=upsample_to, dtype=dtype)
        ref_out = jnp.asarray(ref_fn(images), jnp.float32)
        ref_norm = float(jnp.linalg.norm(ref_out))

    results = []
    for name, spec in _serving_candidates(model, batch, int8=int8):
        try:
            fn = build_serving_candidate(model, variables, spec,
                                         upsample_to=upsample_to, dtype=dtype)
            fps = _timed_fps(fn, images, batch, warmup=warmup, iters=iters)
            row = {"candidate": name, **spec, "fps": round(fps, 2)}
            if spec.get("int8") and ref_out is not None:
                delta = float(jnp.linalg.norm(
                    jnp.asarray(fn(images), jnp.float32) - ref_out))
                row["rel_out_err"] = round(delta / max(ref_norm, 1e-30), 5)
            results.append(row)
            if verbose:
                extra = (f"  (rel_err {row['rel_out_err']})"
                         if "rel_out_err" in row else "")
                print(f"  {name:>22}: {fps:8.1f} img/s{extra}", flush=True)
        except Exception as exc:  # candidate invalid on this backend — skip
            results.append({"candidate": name, **spec, "fps": None,
                            "error": f"{type(exc).__name__}: {exc}"[:200]})
            if verbose:
                print(f"  {name:>22}: failed ({type(exc).__name__})",
                      flush=True)

    ok = [r for r in results if r["fps"]]
    if not ok:
        raise RuntimeError(f"every serving candidate failed: {results}")
    best = max(ok, key=lambda r: r["fps"])
    entry = {"path": best["path"], "dw_impl": best["dw_impl"],
             "int8": bool(best.get("int8", False)),
             "bake_weights": bool(best.get("bake_weights", False)),
             "fps": best["fps"], "measured": results}
    if "rel_out_err" in best:
        entry["rel_out_err"] = best["rel_out_err"]

    if policy_path:
        policy = load_policy(policy_path)
        policy[policy_key(model, batch, dtype)] = entry
        os.makedirs(os.path.dirname(policy_path) or ".", exist_ok=True)
        with open(policy_path, "w") as f:
            json.dump(policy, f, indent=2)

    fn = build_serving_candidate(model, variables,
                                 {"path": best["path"],
                                  "dw_impl": best["dw_impl"],
                                  "int8": best.get("int8", False),
                                  "bake_weights": best.get(
                                      "bake_weights", False)},
                                 upsample_to=upsample_to, dtype=dtype)
    return fn, entry


# --------------------------------------------------------------- training
# The serving side has had a measured policy cache since round 3; the
# training side's {accum_steps, remat} choice was manual (PERFORMANCE.md
# "Training remat": accumulation wins past the ~b128 HBM knee, XLA-auto
# remat loses 6x there). autotune_train measures the same grid per
# (device, family, batch, dtype) and caches the winner for the train CLI.

def train_policy_key(encoder: str, decoder: str, batch: int, dtype) -> str:
    device_kind = jax.devices()[0].device_kind.replace(" ", "_")
    dt = jnp.dtype(dtype).name if dtype is not None else "float32"
    return f"{device_kind}|{encoder}-{decoder}|b{batch}|{dt}"


def _train_candidates(batch: int):
    """{accum_steps} × {remat} grid. accum must divide the batch; remat
    'dots'/'full' are the two explicit jax.checkpoint policies the train
    step supports (training/train_step.py)."""
    cands = []
    for accum in (1, 2, 4, 8):
        if batch % accum or batch // accum < 1:
            continue
        for remat in (None, "dots", "full"):
            if accum > 1 and remat is not None:
                # accumulation already bounds live activation memory to one
                # microbatch; stacking remat on top only adds recompute
                continue
            cands.append({"accum_steps": accum, "remat": remat})
    return cands


def _timed_train_step(step, state, batch, rng, *, warmup=1, iters=4,
                      batch_size=1):
    """img/s with forced completion (scalar fetch of every step's loss)."""
    losses = []
    state, metrics = step(state, batch, rng)  # compile
    float(metrics["loss"])
    for _ in range(warmup):
        state, metrics = step(state, batch, rng)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch, rng)
        losses.append(metrics["loss"])
    checksum = float(jnp.stack(losses).sum())
    dt = time.perf_counter() - t0
    if not np.isfinite(checksum):
        raise FloatingPointError(f"non-finite training loss ({checksum})")
    return batch_size * iters / dt


def autotune_train(encoder: str, decoder: str, batch: int, *,
                   crop_hw=(228, 304), bf16: bool = True,
                   policy_path: Optional[str] = TRAIN_POLICY_PATH,
                   warmup: int = 1, iters: int = 4, verbose: bool = True):
    """Measure the {accum_steps, remat} grid for one family at one batch on
    the current device; cache the winner. Returns the policy entry."""
    from efficientdepthestimation_tpu.apps.common import init_variables
    from efficientdepthestimation_tpu.models import build_model
    from efficientdepthestimation_tpu.training.train_step import (
        adam_with_l2,
        create_train_state,
        make_train_step,
        step_lr,
    )

    h, w = crop_hw
    if decoder == "lasinger2019":
        model = build_model(encoder, decoder, input_size=crop_hw,
                            output_size=(h // 2, w // 2))
    else:
        model = build_model(encoder, decoder)
    variables = init_variables(model, crop_hw)
    tx = adam_with_l2(step_lr(1e-4, steps_per_epoch=100), 1e-4)
    base_state = create_train_state(model, variables, tx)

    # raw uint8 batches generated ON DEVICE (the step runs the full
    # augmentation stack; host uploads through the tunnel would dominate)
    key = jax.random.PRNGKey(0)
    raw = jax.jit(lambda k: {
        "image": jax.random.randint(k, (batch, 480, 640, 3), 0, 256,
                                    jnp.int32).astype(jnp.uint8),
        "depth": jax.random.randint(jax.random.fold_in(k, 1),
                                    (batch, 480, 640), 10, 250,
                                    jnp.int32).astype(jnp.uint8),
    })(key)
    raw["num_valid"] = jnp.asarray(batch, jnp.int32)
    jax.block_until_ready(raw)

    results = []
    for spec in _train_candidates(batch):
        name = (f"accum{spec['accum_steps']}/"
                f"{spec['remat'] or 'no-remat'}")
        try:
            step = make_train_step(mixed_precision=bf16, crop_hw=crop_hw,
                                   donate=False, **spec)
            rate = _timed_train_step(step, base_state, raw,
                                     jax.random.PRNGKey(1), warmup=warmup,
                                     iters=iters, batch_size=batch)
            results.append({"candidate": name, **spec,
                            "img_per_s": round(rate, 2)})
            if verbose:
                print(f"  {name:>18}: {rate:8.1f} img/s", flush=True)
        except Exception as exc:  # OOM etc — record and skip
            results.append({"candidate": name, **spec, "img_per_s": None,
                            "error": f"{type(exc).__name__}: {exc}"[:200]})
            if verbose:
                print(f"  {name:>18}: failed ({type(exc).__name__})",
                      flush=True)

    ok = [r for r in results if r["img_per_s"]]
    if not ok:
        raise RuntimeError(f"every training candidate failed: {results}")
    best = max(ok, key=lambda r: r["img_per_s"])
    entry = {"accum_steps": best["accum_steps"], "remat": best["remat"],
             "img_per_s": best["img_per_s"], "measured": results}

    if policy_path:
        policy = load_policy(policy_path)
        policy[train_policy_key(encoder, decoder, batch,
                                jnp.bfloat16 if bf16 else None)] = entry
        os.makedirs(os.path.dirname(policy_path) or ".", exist_ok=True)
        with open(policy_path, "w") as f:
            json.dump(policy, f, indent=2)
    return entry


def apply_train_policy(policy_path: Optional[str], encoder: str, decoder: str,
                       batch: int, dtype, accum_steps: Optional[int],
                       remat: Optional[str]):
    """Resolve the effective (accum_steps, remat, source) for the train CLI.

    A policy entry is a JOINTLY-measured {accum_steps, remat} winner — the
    grid never pairs accum>1 with remat (_train_candidates), so splicing one
    explicit flag with the other half of a measured pair would produce a
    combination nobody measured (e.g. policy {accum 4, remat None} +
    ``--accum-steps 1`` silently yielding no-remat at accum 1, which may not
    fit HBM). Therefore: if EITHER flag is explicit, the policy entry is
    ignored wholesale (pure flags + defaults, source "flags"); only with no
    explicit flags does a measured entry for this exact (device, family,
    batch, dtype) key apply; else the defaults (accum 1, no remat)."""
    explicit_accum = accum_steps is not None
    explicit_remat = remat is not None and remat != "auto"
    accum = accum_steps if explicit_accum else 1
    rem = None if (remat in (None, "auto", "none")) else remat
    if explicit_accum or explicit_remat:
        return accum, rem, "flags"
    entry = (load_policy(policy_path) if policy_path else {}).get(
        train_policy_key(encoder, decoder, batch, dtype))
    if not entry:
        return accum, rem, "defaults"
    return int(entry["accum_steps"]), entry["remat"], "policy"


def main(args: Optional[List[str]] = None):
    from efficientdepthestimation_tpu.apps.common import init_variables
    from efficientdepthestimation_tpu.models import build_model
    from efficientdepthestimation_tpu.utils.jitcache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    parser = argparse.ArgumentParser(
        description="Measure serving variants on this device; cache winner")
    parser.add_argument("--encoder", default="efficientnet-b0")
    parser.add_argument("--decoder", default="hu2018",
                        choices=("hu2018", "lasinger2019"))
    parser.add_argument("--batch", default=128, type=int)
    parser.add_argument("--crop-hw", nargs=2, type=int, default=[228, 304])
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--int8", action="store_true",
                        help="also measure dynamic-int8 variants "
                             "(numerics-changing; winner records rel_out_err)")
    parser.add_argument("--iters", default=5, type=int)
    parser.add_argument("--policy", default=None,
                        help="policy JSON path (default: serving_policy.json "
                             "or train_policy.json under runs/)")
    parser.add_argument("--train", action="store_true",
                        help="tune the TRAINING step ({accum_steps, remat} "
                             "grid) instead of serving; the train CLI "
                             "consumes the resulting policy")
    ns = parser.parse_args(args=args)

    crop = tuple(ns.crop_hw)
    if ns.train:
        policy = ns.policy or TRAIN_POLICY_PATH
        print(f"autotuning TRAIN {ns.encoder}-{ns.decoder} batch={ns.batch} "
              f"bf16={ns.bf16} on {jax.devices()[0].device_kind}")
        entry = autotune_train(ns.encoder, ns.decoder, ns.batch,
                               crop_hw=crop, bf16=ns.bf16,
                               policy_path=policy, iters=ns.iters)
        print(json.dumps({"winner": {k: entry[k] for k in
                                     ("accum_steps", "remat", "img_per_s")},
                          "policy": policy}))
        return entry
    ns.policy = ns.policy or DEFAULT_POLICY_PATH
    if ns.decoder == "lasinger2019":
        model = build_model(ns.encoder, ns.decoder, input_size=crop,
                            output_size=(crop[0] // 2, crop[1] // 2))
    else:
        model = build_model(ns.encoder, ns.decoder)
    variables = init_variables(model, crop)
    dtype = jnp.bfloat16 if ns.bf16 else None

    print(f"autotuning {_model_id(model)} batch={ns.batch} "
          f"on {jax.devices()[0].device_kind}")
    _, entry = autotune_serving(model, variables, ns.batch, crop_hw=crop,
                                dtype=dtype, policy_path=ns.policy,
                                iters=ns.iters, int8=ns.int8)
    print(json.dumps({"winner": {k: entry[k] for k in
                                 ("path", "dw_impl", "int8", "bake_weights",
                                  "fps")},
                      "policy": ns.policy}))
    return entry


if __name__ == "__main__":
    main()
