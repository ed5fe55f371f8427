"""Ahead-of-time serving artifacts (jax.export / StableHLO).

The reference's deployment story is "install the source tree + a matching
torch, then load the ``.pth``" — every serving site re-runs the model code
(``ReSIDE/inference_benchmark.py:30-47``, ``Benchmark/reside_model.py:40-60``).
The TPU-native equivalent is ahead-of-time export: the ENTIRE serving
pipeline — uint8 frame ingest → PIL-parity preprocess (Scale 240 +
CenterCrop + ImageNet normalize) → bf16 forward → align-corners upsample —
is traced once, lowered to StableHLO with :mod:`jax.export`, and written as
one self-contained artifact. A serving site deserializes and calls it with
nothing but ``jax`` installed: no model classes, no checkpoint parsing, no
framework import. StableHLO's compatibility guarantees (≥6 months back /
≥1 month forward) make the artifact outlive the framework version that
produced it.

Two weight modes mirror :func:`apps.common.make_infer_fn`:

- **baked** (default): the weight values are compile-time constants inside
  the module — single-file deployment, and XLA folds BatchNorm affines /
  pre-packs layouts at compile time (the +47–68 % serving lever measured in
  PERFORMANCE.md "Constant-baked weights").
- **arg weights** (``bake_weights=False``): the module takes the weight
  tree as arguments and the artifact carries the tree alongside it
  (msgpack) — the loader rebinds, so one compiled program can serve swapped
  checkpoints of the same architecture.

Batch is static by default (the MXU sweet spot is a fixed batch, 128 on
v5e) but may be exported symbolically (``batch=None``) so one artifact
serves any batch size — each concrete size compiles once at the serving
site, where :func:`apps.common.make_tiled_infer_fn`-style tiling can sit on
top.

**Measured cost of the artifact path** (PERFORMANCE.md "AOT serving
artifacts", v5e b32 e2e): the deserialized module returns bit-identical
outputs but serves at ~0.4× the live-jit rate (212 vs 541 fps) —
``Exported.call`` re-enters through ``xla.call_module`` per call instead
of dispatching a cached executable — and large baked exports can hit a
compile-scaling cliff (b128+bf16+baked did not compile in 28 min; b32 is
~2 min). Use artifacts for portability/interchange and cold-start; serve
hot fixed-checkpoint traffic live via ``apps.common.make_serving_fn``.
"""

from __future__ import annotations

import io
import json
import zipfile
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization as flax_serialization

__all__ = ["export_serving", "save_serving_artifact", "load_serving_artifact"]

_MODULE_MEMBER = "module.jaxexp"
_META_MEMBER = "meta.json"
_WEIGHTS_MEMBER = "weights.msgpack"
_FORMAT = "ede-serving-artifact"
_FORMAT_VERSION = 1


def _pipeline(model, crop_hw, out_hw, dtype):
    """The monolithic serving program (same math as bench.py / make_infer_fn)."""
    from efficientdepthestimation_tpu.data.transforms import (
        eval_preprocess_image_only,
    )
    from efficientdepthestimation_tpu.ops.resize import (
        resize_bilinear_align_corners,
    )

    def run(variables, frames_u8):
        images = eval_preprocess_image_only(frames_u8, crop_hw)
        if dtype is not None:
            images = images.astype(dtype)
        depth = model.apply(variables, images).astype(jnp.float32)
        if out_hw is not None:
            depth = resize_bilinear_align_corners(depth, out_hw)
        return depth

    return run


def export_serving(model, variables, *, batch: int | None = 128,
                   in_hw: tuple[int, int] = (480, 640),
                   crop_hw: tuple[int, int] = (228, 304),
                   out_hw: tuple[int, int] | None = (480, 640),
                   dtype=jnp.bfloat16, bake_weights: bool = True,
                   platforms: tuple[str, ...] | None = None):
    """Lower the full serving pipeline to a :class:`jax.export.Exported`.

    ``batch=None`` exports a symbolic leading dimension (any batch size at
    call time). ``platforms`` defaults to the process's default backend;
    pass e.g. ``("tpu", "cpu")`` for a multi-platform module.
    """
    from jax import export as jexport

    if dtype is not None:
        variables = jax.tree_util.tree_map(
            lambda v: v.astype(dtype)
            if hasattr(v, "astype") and v.dtype == jnp.float32 else v,
            variables)

    if batch is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch)
    frames_spec = jax.ShapeDtypeStruct((b, *in_hw, 3), jnp.uint8)

    run = _pipeline(model, tuple(crop_hw), None if out_hw is None
                    else tuple(out_hw), dtype)
    kwargs: dict[str, Any] = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)

    if bake_weights:
        # Host-resident numpy leaves: the tracer embeds them directly as
        # StableHLO constants. (Do NOT device_put here — lowering would then
        # fetch every leaf back across the device transport one by one;
        # measured as a multi-minute stall over the axon tunnel. The
        # runtime "capture device-resident weights" rule is for live jit
        # closures, not AOT export — the module carries its constants.)
        baked = jax.tree_util.tree_map(np.asarray, variables)
        fn = jax.jit(lambda frames: run(baked, frames))
        return jexport.export(fn, **kwargs)(frames_spec)

    var_specs = jax.tree_util.tree_map(
        lambda v: jax.ShapeDtypeStruct(np.shape(v), v.dtype), variables)
    fn = jax.jit(run)
    return jexport.export(fn, **kwargs)(var_specs, frames_spec)


def save_serving_artifact(path, model, variables, *, encoder: str,
                          decoder: str, batch: int | None = 128,
                          in_hw: tuple[int, int] = (480, 640),
                          crop_hw: tuple[int, int] = (228, 304),
                          out_hw: tuple[int, int] | None = (480, 640),
                          dtype=jnp.bfloat16, bake_weights: bool = True,
                          platforms: tuple[str, ...] | None = None) -> dict:
    """Export + write a single-file serving artifact; returns its metadata."""
    if dtype is not None:
        # the stored tree must match the exported module's signature
        variables = jax.tree_util.tree_map(
            lambda v: v.astype(dtype)
            if hasattr(v, "astype") and v.dtype == jnp.float32 else v,
            variables)
    exported = export_serving(
        model, variables, batch=batch, in_hw=in_hw, crop_hw=crop_hw,
        out_hw=out_hw, dtype=dtype, bake_weights=bake_weights,
        platforms=platforms)

    meta = {
        "format": _FORMAT,
        "format_version": _FORMAT_VERSION,
        "encoder": encoder,
        "decoder": decoder,
        "batch": batch,  # None → symbolic (any batch)
        "in_hw": list(in_hw),
        "crop_hw": list(crop_hw),
        "out_hw": None if out_hw is None else list(out_hw),
        "dtype": None if dtype is None else jnp.dtype(dtype).name,
        "baked_weights": bool(bake_weights),
        "platforms": list(exported.platforms),
        "calling_convention_version": exported.calling_convention_version,
        "jax_version": jax.__version__,
    }

    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(_META_MEMBER, json.dumps(meta, indent=2))
        zf.writestr(_MODULE_MEMBER, exported.serialize())
        if not bake_weights:
            payload = flax_serialization.msgpack_serialize(
                jax.tree_util.tree_map(np.asarray, variables))
            zf.writestr(_WEIGHTS_MEMBER, payload)
    return meta


def load_serving_artifact(path, *, bake_on_load: bool = False):
    """Deserialize an artifact → ``(fn, meta)``.

    ``fn(frames_u8) -> depth_f32`` runs the exported module; only ``jax``
    (and for arg-weight artifacts ``flax.serialization``) is needed — no
    model code. Each concrete input shape compiles once (cached by jit).

    The call is wrapped in an outer :func:`jax.jit`: a bare
    ``Exported.call`` re-traces through ``xla.call_module`` on every
    invocation (~0.4× the live rate, PERFORMANCE.md "AOT serving
    artifacts"); under jit the module lowers once and every later call is
    a cached-executable dispatch.

    ``bake_on_load=True`` (arg-weight artifacts only): close the restored
    weight tree over the jit as host constants instead of passing it as
    arguments — the serving site gets the same constant-folding speedup as
    a baked export (+47–68 %, PERFORMANCE.md) while the ARTIFACT stays
    small and compiles fast (the b128 baked-module compile cliff lives in
    the exported constants, not in baking per se).
    """
    from jax import export as jexport

    with zipfile.ZipFile(path, "r") as zf:
        meta = json.loads(zf.read(_META_MEMBER).decode())
        if meta.get("format") != _FORMAT:
            raise ValueError(f"Not a serving artifact: {path}")
        exported = jexport.deserialize(zf.read(_MODULE_MEMBER))
        weights = None
        if not meta.get("baked_weights", True):
            weights = flax_serialization.msgpack_restore(
                zf.read(_WEIGHTS_MEMBER))

    if weights is None:
        if bake_on_load:
            raise ValueError(
                "bake_on_load applies to arg-weight artifacts; this "
                "artifact's weights are already baked into the module")
        fn = jax.jit(exported.call)
    elif bake_on_load:
        # numpy leaves close over the trace as embedded constants
        fn = jax.jit(lambda frames_u8: exported.call(weights, frames_u8))
    else:
        device_weights = jax.device_put(weights)
        call = jax.jit(exported.call)

        def fn(frames_u8):
            return call(device_weights, frames_u8)

    return fn, meta


def _read_meta(path) -> dict:
    with zipfile.ZipFile(path, "r") as zf:
        return json.loads(zf.read(_META_MEMBER).decode())
