"""Shared app plumbing: universal checkpoint loading, jit forward builders."""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["load_any_checkpoint", "make_infer_fn", "make_staged_infer_fn",
           "make_tiled_infer_fn", "make_serving_fn", "init_variables",
           "infer_arch_from_path"]

# Every app imports this module before any backend is created; honoring an
# explicit JAX_PLATFORMS=cpu here makes `JAX_PLATFORMS=cpu python -m
# ...apps.<app>` reliable even when a boot hook pins a hardware backend
# whose transport is down.
from efficientdepthestimation_tpu.utils.platform import honor_explicit_cpu_request

honor_explicit_cpu_request()


def infer_arch_from_path(model_path: str) -> tuple[str, str]:
    """Substring-sniffing fallback (demo.py:25-31): encoder from the path,
    hu2018 decoder assumed unless 'lasinger'/'lr' appears."""
    # First try the released-checkpoint convention ('ENB0-HU.pth' — the
    # name dispatch of inference_benchmark.py:117-125)...
    from efficientdepthestimation_tpu.models.registry import parse_checkpoint_name

    try:
        return parse_checkpoint_name(os.path.basename(model_path))
    except ValueError:
        pass
    # ...then the demo.py:25-31 substring sniffing.
    lower = os.path.splitext(os.path.basename(model_path))[0].lower()
    decoder = "lasinger2019" if ("lasinger" in lower or lower.endswith("-lr")) else "hu2018"
    for token, enc in (
        ("efficientnet-b4", "efficientnet-b4"), ("efficientnet-b0", "efficientnet-b0"),
        ("efficientnet", "efficientnet-b4"),  # demo.py defaults the variant to b4
        ("resnet", "resnet50"), ("densenet", "densenet161"), ("senet", "senet154"),
    ):
        if token in lower:
            return enc, decoder
    raise ValueError(f"Cannot infer architecture from '{model_path}'")


def load_any_checkpoint(path: str, model=None, example_input_hw=(228, 304)):
    """Load .pth (reference format) or native EDE msgpack → (model, variables)."""
    from efficientdepthestimation_tpu.checkpoints.pth_import import import_pth
    from efficientdepthestimation_tpu.checkpoints.serialization import load_checkpoint

    with open(path, "rb") as f:
        magic = f.read(4)
    if magic == b"EDE1":
        loaded_model, variables, _ = load_checkpoint(path)
        return model or loaded_model, variables
    return import_pth(path, model=model, example_input_hw=example_input_hw)


def init_variables(model, input_hw=(228, 304), batch: int = 1, seed: int = 0):
    x = jnp.zeros((batch, *input_hw, 3), jnp.float32)
    return model.init(
        {"params": jax.random.PRNGKey(seed), "dropout": jax.random.PRNGKey(seed + 1)}, x
    )


def _efficientnet_variant(model):
    """The encoder's variant string if it is an EfficientNet, else None."""
    from efficientdepthestimation_tpu.models.efficientnet import (
        EfficientNetFeatures,
    )

    fac = getattr(model, "encoder_factory", None)
    if getattr(fac, "func", None) is EfficientNetFeatures:
        return fac.keywords.get("variant", "efficientnet-b0")
    return None


def _fused_encoder_apply(model):
    """An apply-compatible fn running the Pallas fused-MBConv encoder path.

    Only Hu2018 models with EfficientNet encoders qualify (the depthwise
    hot path lives there); returns None otherwise and callers fall back to
    ``model.apply``. Semantics pinned equal to the module forward by
    tests/test_pallas_depthwise.py.
    """
    from efficientdepthestimation_tpu.models.efficientnet import (
        efficientnet_apply_fused,
    )
    from efficientdepthestimation_tpu.models.hu2018 import (
        DecoderD,
        HuDepthModel,
        MFF,
        RefineR,
    )

    variant = _efficientnet_variant(model)
    if variant is None or not isinstance(model, HuDepthModel):
        return None

    def sub(variables, name):
        out = {"params": variables["params"][name]}
        if "batch_stats" in variables:
            out["batch_stats"] = variables["batch_stats"][name]
        return out

    def apply_fn(variables, images, train: bool = False):
        taps = efficientnet_apply_fused(sub(variables, "E"), images, variant)
        x_d = DecoderD(model.num_features).apply(sub(variables, "D"), taps,
                                                 False)
        x_mff = MFF().apply(sub(variables, "MFF"), taps, x_d.shape[1:3],
                            False)
        return RefineR(model.block_channel[3]).apply(
            sub(variables, "R"),
            jnp.concatenate([x_d, x_mff], axis=-1), False)

    return apply_fn


def make_infer_fn(model, variables, *, upsample_to=None, dtype=None,
                  mesh=None, spatial=False, dw_impl="xla", int8=False,
                  bake_weights=False, preprocess=False):
    """jit'd forward on normalized NHWC images; optional output upsample.

    ``preprocess=True``: the returned fn takes raw **uint8 frames** and runs
    the PIL-parity eval preprocess (Scale 240 → CenterCrop 228×304 →
    ImageNet normalize, ``data.transforms.eval_preprocess_image_only``)
    INSIDE the same program as the forward — the full per-frame pipeline of
    ``ReSIDE/inference_benchmark.py:156-162`` / ``test_nyu.py`` as one
    fused executable (uint8 in → depth out), with no host round-trip
    between preprocess and model.

    By default the variables are passed as jit *arguments* (bound here):
    closure-captured **host** weights become constants some runtimes
    (including the axon tunnel) re-stage on every call — measured at ~50 ms
    per call for ENB0-HU vs ~0.4 ms with argument-passed, device-resident
    weights.

    ``bake_weights=True`` closes the jit over the *device-resident* weight
    tree instead (no per-call re-staging — the round-1 pathology was
    host-resident captures), making every weight a compile-time constant.
    XLA then specializes the program to the values — folding BatchNorm
    affines into adjacent convs and pre-packing weight layouts at compile
    time instead of per call. Measured on v5e b128 e2e: ENB0-HU 2128→3698
    fps, RN50-HU 774→1328 fps (perf/const_weights_probe.py). The costs: the
    executable embeds the weights (one compile per checkpoint — no compile
    reuse across weight values) and constant folding may reassociate float
    ops, so outputs can differ from the argument path at ~1-ulp level
    (equivalence-tested within tolerance, not bitwise). The right default
    for fixed-checkpoint serving; wrong for anything that swaps weights.

    ``mesh``: SPMD data-parallel *serving* over a ``parallel.create_mesh``
    device mesh — parameters replicated, batch sharded along the ``data``
    axis (the inference-side analogue of the reference's DataParallel use in
    test/demo/benchmark wrappers, ReSIDE/test.py:17, demo.py:32,
    Benchmark/reside_model.py:47-49). The batch must be divisible by the
    data-axis size; outputs come back sharded the same way, so chained
    device code keeps running without a gather.

    ``int8=True``: route FLOP-bound dense convs through the dynamic int8
    path (``ops.quant.quantized_convs``) — a numerics-changing opt-in;
    never the default (see PERFORMANCE.md "int8").

    ``spatial=True`` (with ``mesh``): spatial parallelism instead — image
    *rows* are sharded across every mesh device and GSPMD compiles conv
    halo exchanges onto ICI. This is the latency play for batch sizes too
    small to data-shard (a single video frame on a whole slice); any batch
    size works.
    """
    from efficientdepthestimation_tpu.ops.resize import resize_bilinear_align_corners

    if dtype is not None:
        variables = jax.tree_util.tree_map(
            lambda v: v.astype(dtype) if hasattr(v, "astype") and
            v.dtype == jnp.float32 else v, variables)

    if mesh is None:
        variables = jax.device_put(variables)
        in_shardings = None
    else:
        from efficientdepthestimation_tpu.parallel.mesh import (
            data_sharding,
            replicated_sharding,
            spatial_sharding,
        )

        variables = jax.device_put(variables, replicated_sharding(mesh))
        if spatial:
            # row counts need not divide the device count, and uneven shards
            # can't cross the jit boundary — constrain *inside* the program
            # (GSPMD pads the ragged shard) instead of pinning the argument
            row_sharding = spatial_sharding(mesh)
            in_shardings = (replicated_sharding(mesh), None)
        else:
            in_shardings = (replicated_sharding(mesh), data_sharding(mesh))

    from efficientdepthestimation_tpu.ops.conv import depthwise_impl

    apply_fn = model.apply
    if dw_impl == "pallas":
        apply_fn = _fused_encoder_apply(model) or model.apply
        dw_impl = "xla"

    def fwd(variables, images):
        if preprocess:
            from efficientdepthestimation_tpu.data.transforms import (
                eval_preprocess_image_only,
            )

            images = eval_preprocess_image_only(images)
        if mesh is not None and spatial:
            images = jax.lax.with_sharding_constraint(images, row_sharding)
        if dtype is not None:
            images = images.astype(dtype)
        with depthwise_impl(dw_impl):  # trace-time lowering choice
            if int8:
                from efficientdepthestimation_tpu.ops.quant import (
                    quantized_convs,
                )

                with quantized_convs():
                    out = apply_fn(variables, images)
            else:
                out = apply_fn(variables, images)
        out = out.astype(jnp.float32)
        if upsample_to is not None:
            out = resize_bilinear_align_corners(out, upsample_to)
        return out

    if bake_weights:
        img_shardings = None if in_shardings is None else (in_shardings[1],)
        return jax.jit(lambda images: fwd(variables, images),
                       in_shardings=img_shardings)

    infer = jax.jit(fwd, in_shardings=in_shardings)
    return lambda images: infer(variables, images)


def make_staged_infer_fn(model, variables, *, upsample_to=None, dtype=None,
                         mff_merge: str = "module", dw_impl="xla",
                         int8=False, bake_weights=False, preprocess=False):
    """Hu2018 forward as four chained jit programs (encoder → D → MFF → R).

    ``mff_merge``: "module" runs the flax MFF as-is; "grouped"/"blockdiag"
    run the four 16-channel branch tails as one 64-channel stream
    (``models.hu2018.mff_apply_merged``) — exact, same variable tree.

    At large batch, XLA's single monolithic executable for a large model
    hits a buffer-assignment cliff (measured on v5e: RN50-HU batch 128 runs
    158 ms monolithic vs 95 ms staged — perf/composition_gap.py; an
    optimization_barrier variant shows it is not a fusion effect). Chained
    jits dispatch asynchronously, so the split costs no pipeline bubbles;
    intermediates stay device-resident.

    Measured e2e 640×480 serving on the v5e chip (perf/staged_sweep.py):
    RN50-HU batch 128 → 1291 fps staged vs 783 monolithic (batch 256:
    1280 vs 783). Small models do NOT benefit — ENB0-HU batch 128 is 2149
    fps monolithic vs 1429 staged (stage-boundary HBM round-trips dominate
    without the cliff) — so this path is opt-in for large-footprint
    models/batches, not the default. Falls back to ``make_infer_fn`` for
    non-Hu models.
    """
    from efficientdepthestimation_tpu.models.hu2018 import (
        DecoderD,
        HuDepthModel,
        MFF,
        RefineR,
        mff_apply_merged,
    )
    from efficientdepthestimation_tpu.ops.resize import resize_bilinear_align_corners

    if not isinstance(model, HuDepthModel):
        return make_infer_fn(model, variables,
                             upsample_to=upsample_to, dtype=dtype, int8=int8,
                             bake_weights=bake_weights, preprocess=preprocess)

    if dtype is not None:
        variables = jax.tree_util.tree_map(
            lambda v: v.astype(dtype) if hasattr(v, "astype") and
            v.dtype == jnp.float32 else v, variables)
    variables = jax.device_put(variables)

    def sub(name):
        out = {"params": variables["params"][name]}
        if "batch_stats" in variables:
            out["batch_stats"] = variables["batch_stats"][name]
        return out

    enc = model.encoder_factory()
    d_mod = DecoderD(model.num_features)
    mff_mod = MFF()
    r_mod = RefineR(model.block_channel[3])

    from efficientdepthestimation_tpu.ops.conv import depthwise_impl
    from efficientdepthestimation_tpu.ops.quant import quantized_convs

    import contextlib

    def qctx():
        return quantized_convs() if int8 else contextlib.nullcontext()

    enc_variant = _efficientnet_variant(model)

    def enc_body(v, images):
        if preprocess:  # uint8 frames → normalized crops, fused into stage 1
            from efficientdepthestimation_tpu.data.transforms import (
                eval_preprocess_image_only,
            )

            images = eval_preprocess_image_only(images)
        if dtype is not None:
            images = images.astype(dtype)
        if dw_impl == "pallas" and enc_variant is not None:
            from efficientdepthestimation_tpu.models.efficientnet import (
                efficientnet_apply_fused,
            )

            return efficientnet_apply_fused(v, images, enc_variant)
        with depthwise_impl("xla" if dw_impl == "pallas" else dw_impl), \
                qctx():
            return enc.apply(v, images, False)

    def d_body(v, taps):
        with qctx():
            return d_mod.apply(v, taps, False)

    def mff_body(v, taps, size):
        with qctx():
            if mff_merge == "module":
                return mff_mod.apply(v, taps, size, False)
            return mff_apply_merged(v, taps, size,
                                    block_diag=(mff_merge == "blockdiag"))

    def r_body(v, x_d, x_mff):
        with qctx():
            out = r_mod.apply(v, jnp.concatenate([x_d, x_mff], axis=-1),
                              False)
        out = out.astype(jnp.float32)
        if upsample_to is not None:
            out = resize_bilinear_align_corners(out, upsample_to)
        return out

    ev, dv, mv, rv = sub("E"), sub("D"), sub("MFF"), sub("R")

    # Stage intermediates are donated at their *last* consumer (taps feed
    # both D and MFF, so MFF — which runs second — donates them; D's and
    # MFF's outputs are donated into R). TPU programs execute in dispatch
    # order, so donation frees each intermediate's HBM the moment its final
    # reader runs — batch-256 serving headroom without changing results.
    if bake_weights:
        # Device-resident weights baked as per-stage compile-time constants
        # (see make_infer_fn's bake_weights docstring for the trade-offs).
        run_enc = jax.jit(lambda images: enc_body(ev, images))
        run_d = jax.jit(lambda taps: d_body(dv, taps))
        run_mff = jax.jit(lambda taps, size: mff_body(mv, taps, size),
                          static_argnums=(1,), donate_argnums=(0,))
        run_r = jax.jit(lambda x_d, x_mff: r_body(rv, x_d, x_mff),
                        donate_argnums=(0, 1))

        def infer(images):
            taps = run_enc(images)
            size = (taps[0].shape[1] * 2, taps[0].shape[2] * 2)
            x_d = run_d(taps)
            x_mff = run_mff(taps, size)
            return run_r(x_d, x_mff)

        return infer

    run_enc = jax.jit(enc_body)
    run_d = jax.jit(d_body)
    run_mff = jax.jit(mff_body, static_argnums=(2,), donate_argnums=(1,))
    run_r = jax.jit(r_body, donate_argnums=(1, 2))

    def infer(images):
        taps = run_enc(ev, images)
        size = (taps[0].shape[1] * 2, taps[0].shape[2] * 2)
        x_d = run_d(dv, taps)
        x_mff = run_mff(mv, taps, size)
        return run_r(rv, x_d, x_mff)

    return infer


def make_tiled_infer_fn(model, variables, *, tile_batch=128, staged=True,
                        upsample_to=None, dtype=None, dw_impl="xla",
                        int8=False, bake_weights=False, preprocess=False):
    """Serve arbitrary batch sizes by slicing into ``tile_batch`` tiles.

    TPU lane tiling makes batch-128 multiples the throughput sweet spot
    (PERFORMANCE.md): RN50-HU staged runs 1280+ fps at 128/256/384 but drops
    to ~945 fps at 192, and monolithic batch 512 OOMs outright. This wrapper
    dispatches full tiles through the sweet-spot program and the remainder
    through its own (cached) program; chained jits dispatch asynchronously,
    so tiles pipeline with no host sync between them, and peak HBM is
    bounded by one tile's working set regardless of total batch — the
    TPU-serving analogue of the reference's DataLoader chunking
    (Benchmark/reside_model.py:47-55, ReSIDE/test.py:17-33).

    Each distinct remainder size compiles once; fixed serving configurations
    see exactly two compilations (tile + remainder).
    """
    maker = make_staged_infer_fn if staged else make_infer_fn
    base = maker(model, variables, upsample_to=upsample_to, dtype=dtype,
                 dw_impl=dw_impl, int8=int8, bake_weights=bake_weights,
                 preprocess=preprocess)

    def infer(images):
        n = images.shape[0]
        if n <= tile_batch:
            return base(images)
        outs = [base(images[i:i + tile_batch])
                for i in range(0, n - tile_batch + 1, tile_batch)]
        rem = n % tile_batch
        if rem:
            outs.append(base(images[n - rem:]))
        return jnp.concatenate(outs, axis=0)

    return infer


def make_serving_fn(model, variables, *, batch_hint=None, upsample_to=None,
                    dtype=None, mesh=None, spatial=False, dw_impl="xla",
                    policy_path=None, int8=False, bake_weights=None,
                    preprocess=False):
    """Pick the fastest measured serving path for (model, batch) automatically.

    ``policy_path``: a JSON policy written by ``apps.autotune`` — per-device
    measured winners. When the (device, model, batch, dtype) key is present
    it overrides the static policy below (which encodes one v5e chip's
    numbers and may mis-rank other topologies).

    Policy (all numbers measured on a v5e chip, 640×480 e2e,
    perf/staged_sweep_results.jsonl + perf/bake_sweep_*.json):

    - ``mesh`` given → SPMD monolithic (``make_infer_fn``): data-parallel
      for throughput, or row-sharded spatial parallel (``spatial=True``)
      when the batch is too small to split (single-frame latency).
    - ``bake_weights`` (default for fixed-checkpoint batch serving):
      weights embedded as compile-time constants — XLA folds BN affines and
      pre-packs layouts, and the monolithic buffer-assignment cliff
      disappears, so baked monolithic wins every family (ENB0 3510 vs 2083
      fps at b128; RN50 1328 baked-mono vs 1253 staged-arg). Pass
      ``bake_weights=False`` when the same program must serve swapped
      weights; the round-2 arg-weights policy below then applies.
    - wide-top encoders (top tap ≥ 1024 channels: ResNet50+, SENet-154,
      DenseNet-161) at batch ≥ 128, arg weights → staged programs (dodges
      XLA's monolithic buffer-assignment cliff: RN50 1291 vs 783 fps,
      SENet 641 vs 482).
    - narrow-top encoders (EfficientNets) → monolithic (staged boundaries
      cost more than the cliff: ENB0 2149 vs 1429 at batch 128).
    - batch > 128 → batch-tiled over the chosen base, holding the batch-128
      sweet-spot rate and bounding peak HBM (ENB0 b512: 2170 tiled-mono vs
      1444 mono; RN50 b512: 1294 tiled-staged vs 781 mono).

    ``batch_hint`` is the expected per-dispatch batch; without it the
    monolithic path is returned (small-batch apps: demo, point_clouds).
    """
    if mesh is not None or batch_hint is None:
        return make_infer_fn(model, variables, upsample_to=upsample_to,
                             dtype=dtype, mesh=mesh, spatial=spatial,
                             dw_impl=dw_impl, int8=int8,
                             bake_weights=bool(bake_weights),
                             preprocess=preprocess)

    if policy_path:
        from efficientdepthestimation_tpu.apps.autotune import (
            build_serving_candidate,
            load_policy,
            policy_key,
        )

        entry = load_policy(policy_path).get(
            policy_key(model, batch_hint, dtype))
        if entry is not None:
            return build_serving_candidate(
                model, variables,
                {"path": entry["path"], "dw_impl": entry["dw_impl"],
                 "int8": entry.get("int8", False) or int8,
                 "bake_weights": entry.get(
                     "bake_weights", bool(bake_weights))},
                upsample_to=upsample_to, dtype=dtype, preprocess=preprocess)

    # Fixed-checkpoint batch serving defaults to constant-baked weights
    # (measured: ENB0-HU 2128→3698 fps, RN50-HU 774→1328 fps at b128 —
    # perf/const_weights_probe.py); pass bake_weights=False to keep the
    # compile reusable across checkpoints.
    # Size at the dtype the weights will actually be served at: the explicit
    # serving dtype's itemsize when given (bf16=2, but an explicit f32 is 4,
    # not 2 — ADVICE r3), else each leaf's own storage dtype.
    itemsize = None if dtype is None else jnp.dtype(dtype).itemsize
    param_bytes = sum(
        int(np.prod(np.shape(v)))
        * (itemsize if itemsize is not None
           else np.dtype(getattr(v, "dtype", np.float32)).itemsize)
        for v in jax.tree_util.tree_leaves(variables))
    # ≥200 MB of baked constants overflows tunneled remote-compile
    # transports as ONE module (SENet-154: HTTP 413 — perf/b1_latency.json);
    # STAGED programs keep each stage's constants under the limit, and
    # staged+bake measured 779 img/s vs 640 arg-weights for SN154-HU b128
    # (perf/serving_policy_v5e.json). Monolithic huge models fall back to
    # argument weights.
    huge = param_bytes >= 200e6
    explicit_bake = bake_weights is True
    if bake_weights is None:
        bake_weights = True
    wide_top = getattr(model, "block_channel", (0,))[-1] >= 1024
    # Baked monolithic beats staged everywhere EXCEPT wide-top int8 serving,
    # where the quantized staged path keeps its lead (RN50 b128: staged+int8
    # 1401-1453 fps vs baked-mono+int8 1297 — perf/bake_sweep_hu2018_b128.json)
    staged = wide_top and batch_hint >= 128 and (int8 or not bake_weights
                                                 or huge)
    if huge and not staged:
        if explicit_bake:
            import warnings

            warnings.warn(
                f"bake_weights=True overridden to False: {param_bytes/1e6:.0f}"
                " MB of monolithic baked constants overflows tunneled"
                " remote-compile transports (HTTP 413); use the staged path"
                " (batch >= 128 on a wide-top model) to serve baked.")
        bake_weights = False
    if batch_hint > 128:
        return make_tiled_infer_fn(model, variables, staged=staged,
                                   upsample_to=upsample_to, dtype=dtype,
                                   dw_impl=dw_impl, int8=int8,
                                   bake_weights=bake_weights,
                                   preprocess=preprocess)
    if staged:
        return make_staged_infer_fn(model, variables,
                                    upsample_to=upsample_to, dtype=dtype,
                                    dw_impl=dw_impl, int8=int8,
                                    bake_weights=bake_weights,
                                    preprocess=preprocess)
    return make_infer_fn(model, variables, upsample_to=upsample_to,
                         dtype=dtype, dw_impl=dw_impl, int8=int8,
                         bake_weights=bake_weights, preprocess=preprocess)
