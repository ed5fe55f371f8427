"""jit/pjit train & eval steps: one XLA program per step.

TPU-native collapse of the reference's per-batch hot loop
(ReSIDE/train.py:210-252, SURVEY §3.1): preprocessing, forward, the fused
sobel loss, backward, the Adam update, BN running-stat updates and the full
metrics reduction all live in ONE compiled program — no per-metric ``.item()``
syncs, no separate Sobel conv launches. Under a data mesh the same program is
SPMD: the batch enters sharded on the ``data`` axis and XLA inserts the
gradient all-reduce over ICI.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from efficientdepthestimation_tpu.data.transforms import train_preprocess
from efficientdepthestimation_tpu.ops.conv import depthwise_impl
from efficientdepthestimation_tpu.ops.pallas.fused_loss import fused_depth_loss
from efficientdepthestimation_tpu.ops.resize import resize_bilinear_align_corners
from efficientdepthestimation_tpu.training.loss import depth_loss
from efficientdepthestimation_tpu.training.metrics import depth_metrics_batch

__all__ = ["TrainState", "create_train_state", "make_train_step",
           "make_eval_step", "make_grad_snapshot", "step_lr", "adam_with_l2"]


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def step_lr(base_lr: float, steps_per_epoch: int, step_size: int = 5,
            gamma: float = 0.1) -> optax.Schedule:
    """torch StepLR(step_size=5, γ=0.1) (train.py:105), stepped per epoch."""

    def schedule(count):
        epoch = count // steps_per_epoch
        return base_lr * gamma ** (epoch // step_size)

    return schedule


def adam_with_l2(learning_rate, weight_decay: float = 1e-4,
                 frozen_prefixes: tuple[str, ...] = ()) -> optax.GradientTransformation:
    """torch ``Adam(lr, weight_decay)`` = L2 added to the gradient *before*
    the Adam moments (not AdamW) — train.py:104.

    ``frozen_prefixes``: top-level param-tree keys to freeze (zero updates) —
    the TPU equivalent of ``Encoder(freeze_weights=True)``'s
    ``requires_grad_(False)`` (lasinger2019.py:36-38); e.g. ("E",) or
    ("encoder",).
    """
    tx = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.adam(learning_rate),
    )
    if not frozen_prefixes:
        return tx

    def label(params):
        return {key: ("frozen" if key in frozen_prefixes else "trained")
                for key in params}

    return optax.multi_transform(
        {"trained": tx, "frozen": optax.set_to_zero()}, label)


def create_train_state(model, variables, tx: optax.GradientTransformation) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        apply_fn=model.apply,
        tx=tx,
    )


#: Explicit rematerialization policies for the forward pass (round-3 remat
#: experiments, PERFORMANCE.md "Training remat"). ``None`` leaves XLA's
#: auto-remat in charge; "full" recomputes the whole forward during the
#: backward pass (minimum activation memory); "dots" saves matmul/conv
#: contraction results and recomputes the cheap elementwise tissue.
REMAT_POLICIES = ("full", "dots")


def make_train_step(*, use_pallas_loss: bool = False, preprocess: bool = True,
                    pallas_interpret: bool = False, donate: bool = True,
                    mixed_precision: bool = False,
                    crop_hw: tuple = (228, 304),
                    split_preprocess: bool = False,
                    state_shardings=None,
                    dw_impl: str = "xla",
                    remat: str | None = None,
                    accum_steps: int = 1):
    """Build the jit'd train step.

    ``preprocess=True`` takes raw uint8 batches (image 480×640×3, depth
    480×640) and runs the full augmentation stack on device; otherwise the
    batch must already contain preprocessed ``image``/``depth`` tensors.

    ``mixed_precision=True`` runs activations in bfloat16 (MXU-native) while
    parameters, BN statistics, the loss and the optimizer stay in float32
    (the Conv/BatchNorm modules cast per-op and normalize in f32).

    ``state_shardings``: a TrainState-shaped pytree of shardings (see
    ``parallel.zero1_state_shardings``) pinned as the step's state output
    shardings, so a ZeRO-1-sharded optimizer state *stays* sharded across
    steps (donated buffers re-used shard-for-shard) instead of being
    re-replicated by sharding propagation.

    ``split_preprocess=True`` compiles the augmentation stack and the
    forward/backward/optimizer as TWO chained programs instead of one.
    Semantics are identical (the rng streams derive the same way, equivalence
    is test-pinned) and async dispatch chains the programs without a host
    bubble. Measured neutral at batch <=64 on one v5e chip; kept as the
    escape hatch if a monolithic-program scheduling cliff appears at other
    geometries (serving needed exactly this at RN50 batch >=128,
    PERFORMANCE.md round 2).
    """
    if split_preprocess and preprocess:
        core = make_train_step(
            use_pallas_loss=use_pallas_loss, preprocess=False,
            pallas_interpret=pallas_interpret, donate=donate,
            mixed_precision=mixed_precision, crop_hw=crop_hw,
            state_shardings=state_shardings, dw_impl=dw_impl,
            remat=remat, accum_steps=accum_steps)

        @jax.jit
        def pre_step(step, batch, rng):
            rng_aug = jax.random.split(jax.random.fold_in(rng, step))[0]
            return train_preprocess(rng_aug, batch["image"], batch["depth"],
                                    crop_hw=crop_hw)

        def train_step(state: TrainState, batch: dict, rng: jax.Array):
            images, depths = pre_step(state.step, batch, rng)
            fed = {"image": images, "depth": depths}
            if "num_valid" in batch:
                fed["num_valid"] = batch["num_valid"]
            return core(state, fed, rng)

        return train_step

    if remat is not None and remat not in REMAT_POLICIES:
        raise ValueError(f"remat must be one of {REMAT_POLICIES}, got {remat!r}")
    if accum_steps < 1:
        raise ValueError(f"accum_steps must be >= 1, got {accum_steps}")

    def _forward(apply_fn, apply_params, batch_stats, images, rng_drop):
        with depthwise_impl(dw_impl):  # trace-time lowering choice
            return apply_fn(
                {"params": apply_params, "batch_stats": batch_stats},
                images, True,
                mutable=["batch_stats"],
                rngs={"dropout": rng_drop},
            )

    if remat == "full":
        _forward = jax.checkpoint(_forward, static_argnums=(0,))
    elif remat == "dots":
        _forward = jax.checkpoint(
            _forward, static_argnums=(0,),
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)

    def _compute_loss(out, depths, num_valid):
        if use_pallas_loss:
            return fused_depth_loss(out, depths, pallas_interpret,
                                    num_valid=num_valid)
        return depth_loss(out, depths, num_valid=num_valid)

    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        rng_aug, rng_drop = jax.random.split(jax.random.fold_in(rng, state.step))
        # Optional validity count: pad_last duplicates in the final batch of
        # an epoch get zero loss/metric weight (VERDICT round-1, Weak #1).
        num_valid = batch.get("num_valid")
        if preprocess:
            images, depths = train_preprocess(rng_aug, batch["image"],
                                              batch["depth"], crop_hw=crop_hw)
        else:
            images, depths = batch["image"], batch["depth"]
        if mixed_precision:
            images = images.astype(jnp.bfloat16)

        def cast_params(params):
            # Mixed precision casts the WHOLE param tree once here (grads
            # flow back to the f32 master copy through the cast's VJP). The
            # optimization_barrier is load-bearing: without it XLA fuses the
            # f32->bf16 weight converts into the training convolutions, which
            # falls off a 40x cliff at batch >= 96 on v5e (1807 -> 44 ms
            # forward at ENB0 batch 128; perf/train_probe.py). The barrier
            # forces real bf16 weight buffers before the convs.
            if not mixed_precision:
                return params
            return jax.lax.optimization_barrier(
                jax.tree_util.tree_map(
                    lambda v: v.astype(jnp.bfloat16)
                    if v.dtype == jnp.float32 else v, params))

        if accum_steps == 1:
            def loss_fn(params):
                out, updates = _forward(state.apply_fn, cast_params(params),
                                        state.batch_stats, images, rng_drop)
                loss = _compute_loss(out, depths, num_valid)
                return loss, (out, updates["batch_stats"])

            (loss, (out, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            new_state = state.apply_gradients(grads, new_stats)
            metrics = depth_metrics_batch(out, depths, num_valid=num_valid)
            metrics["loss"] = loss
            return new_state, metrics

        # ---- microbatch gradient accumulation (effective batch > HBM) ----
        # Each microbatch's loss is rescaled by its share of the valid
        # samples, so the accumulated gradient equals the monolithic
        # masked-batch gradient by linearity; BN statistics stream through
        # the microbatches sequentially (documented semantic difference from
        # one joint batch: BN normalizes per microbatch).
        n = images.shape[0]
        if n % accum_steps:
            raise ValueError(f"batch {n} not divisible by accum_steps "
                             f"{accum_steps}")
        micro = n // accum_steps
        imgs_m = images.reshape(accum_steps, micro, *images.shape[1:])
        deps_m = depths.reshape(accum_steps, micro, *depths.shape[1:])
        if num_valid is None:
            valid_m = jnp.full((accum_steps,), micro, jnp.int32)
            total_valid = jnp.asarray(n, jnp.float32)
        else:
            valid_m = jnp.clip(num_valid - jnp.arange(accum_steps) * micro,
                               0, micro).astype(jnp.int32)
            total_valid = jnp.maximum(num_valid, 1).astype(jnp.float32)
        rngs_m = jax.random.split(rng_drop, accum_steps)

        params = state.params

        def micro_loss(p, stats, imgs, deps, vcount, r):
            out, updates = _forward(state.apply_fn, cast_params(p), stats,
                                    imgs, r)
            # max(vcount, 1) keeps the masked denominator nonzero for an
            # all-padding microbatch (its weight below is 0 anyway; a 0/0
            # NaN would otherwise poison the backward pass)
            loss = _compute_loss(out, deps, jnp.maximum(vcount, 1))
            scaled = loss * (vcount.astype(jnp.float32) / total_valid)
            return scaled, (out, updates["batch_stats"])

        def body(carry, xs):
            stats, grad_acc, loss_acc, metric_acc = carry
            imgs, deps, vcount, r = xs
            (scaled, (out, new_stats)), grads = jax.value_and_grad(
                micro_loss, has_aux=True)(params, stats, imgs, deps, vcount, r)
            grad_acc = jax.tree_util.tree_map(jnp.add, grad_acc, grads)
            # Same max(vcount, 1) guard as the loss: an all-padding
            # microbatch has num_valid_px == 0 and the raw sums are 0/0 NaN,
            # which would poison the scan carry and the epoch tracker. Keep
            # the denominator nonzero and zero the (weightless) sums instead.
            sums = depth_metrics_batch(out, deps,
                                       num_valid=jnp.maximum(vcount, 1))
            sums = jax.tree_util.tree_map(
                lambda s: jnp.where(vcount > 0, s, jnp.zeros_like(s)), sums)
            metric_acc = jax.tree_util.tree_map(jnp.add, metric_acc, sums)
            return (new_stats, grad_acc, scaled + loss_acc, metric_acc), ()

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
        # metric sums are scalars; shapes of the probe inputs are irrelevant
        zero_metrics = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype),
            jax.eval_shape(depth_metrics_batch, jnp.zeros((1, 1, 1, 1)),
                           jnp.zeros((1, 1, 1, 1))))
        (new_stats, grads, loss, metrics), _ = jax.lax.scan(
            body, (state.batch_stats, zero_grads, jnp.float32(0.0),
                   zero_metrics),
            (imgs_m, deps_m, valid_m, rngs_m))
        new_state = state.apply_gradients(grads, new_stats)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return new_state, metrics

    jit_kwargs = {}
    if state_shardings is not None:
        # metrics (second output) sharding is left to the compiler
        jit_kwargs["out_shardings"] = (state_shardings, None)
    return jax.jit(train_step, donate_argnums=(0,) if donate else (),
                   **jit_kwargs)


def make_grad_snapshot(*, use_pallas_loss: bool = False, preprocess: bool = True,
                       pallas_interpret: bool = False,
                       mixed_precision: bool = False,
                       crop_hw: tuple = (228, 304)):
    """jit'd gradient probe for observability: same loss as the train step but
    returns the raw gradient pytree without applying it — feeds
    ``RunLogger.log_histograms`` once per epoch (wandb.watch parity,
    ReSIDE/train.py:134).
    """

    def grad_snapshot(state: TrainState, batch: dict, rng: jax.Array):
        rng_aug, rng_drop = jax.random.split(jax.random.fold_in(rng, state.step))
        num_valid = batch.get("num_valid")
        if preprocess:
            images, depths = train_preprocess(rng_aug, batch["image"],
                                              batch["depth"], crop_hw=crop_hw)
        else:
            images, depths = batch["image"], batch["depth"]
        if mixed_precision:
            images = images.astype(jnp.bfloat16)

        def loss_fn(params):
            apply_params = params
            if mixed_precision:  # cast once + barrier, as in make_train_step
                apply_params = jax.lax.optimization_barrier(
                    jax.tree_util.tree_map(
                        lambda v: v.astype(jnp.bfloat16)
                        if v.dtype == jnp.float32 else v, params))
            out = state.apply_fn(
                {"params": apply_params, "batch_stats": state.batch_stats},
                images, True,
                mutable=["batch_stats"],
                rngs={"dropout": rng_drop},
            )[0]
            if use_pallas_loss:
                return fused_depth_loss(out, depths, pallas_interpret,
                                        num_valid=num_valid)
            return depth_loss(out, depths, num_valid=num_valid)

        return jax.grad(loss_fn)(state.params)

    return jax.jit(grad_snapshot)


def make_eval_step(*, upsample_to_label: bool = True):
    """jit'd eval step: forward, align-corners upsample to label size,
    metric sums (train.py:259-292). ``num_valid`` masks pad_last duplicates
    out of the metric sums so batched eval equals per-sample eval."""

    @functools.partial(jax.jit, static_argnames=())
    def eval_step(state: TrainState, images: jax.Array, depths: jax.Array,
                  num_valid=None):
        out = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, False,
        )
        if upsample_to_label:
            out = resize_bilinear_align_corners(out, depths.shape[1:3])
        return depth_metrics_batch(out, depths, num_valid=num_valid), out

    return eval_step
