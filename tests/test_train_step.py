"""Train/eval step: loss decreases machinery, BN stats update, SPMD mesh run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from efficientdepthestimation_tpu.models import build_model
from efficientdepthestimation_tpu.parallel import (
    create_mesh,
    data_sharding,
    replicated_sharding,
    scale_batch_size,
    shard_batch,
)
from efficientdepthestimation_tpu.training.train_step import (
    adam_with_l2,
    create_train_state,
    make_eval_step,
    make_train_step,
    step_lr,
)


def _tiny_state(encoder="resnet18", lr=1e-3):
    model = build_model(encoder, "hu2018")
    x = jnp.zeros((2, 32, 48, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x
    )
    tx = adam_with_l2(step_lr(lr, steps_per_epoch=10), 1e-4)
    return model, create_train_state(model, variables, tx)


def test_train_step_runs_and_updates(rng):
    model, state = _tiny_state()
    step = make_train_step(preprocess=False, donate=False)
    batch = {
        "image": jnp.asarray(rng.standard_normal((2, 32, 48, 3), dtype=np.float32)),
        "depth": jnp.asarray(rng.uniform(1, 9, (2, 16, 24, 1)).astype(np.float32)),
    }
    old_params = jax.tree_util.tree_leaves(state.params)[0].copy()
    old_stats = jax.tree_util.tree_leaves(state.batch_stats)[0].copy()
    state, metrics = step(state, batch, jax.random.PRNGKey(42))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
    assert not np.allclose(old_params, jax.tree_util.tree_leaves(state.params)[0])
    assert not np.allclose(old_stats, jax.tree_util.tree_leaves(state.batch_stats)[0])


@pytest.mark.slow  # two full ENB0 train-step compiles (~9 min on 1 CPU core)
def test_dw_shift_train_step_matches_default(rng):
    """dw_impl="shift" (shifted-FMA depthwise lowering) computes the same
    update as the grouped-conv lowering — same loss and same new params up
    to float reassociation — on an EfficientNet model (the only family with
    depthwise convs)."""
    model = build_model("efficientnet-b0", "hu2018")
    x = jnp.zeros((2, 64, 96, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x
    )
    batch = {
        "image": jnp.asarray(rng.standard_normal((2, 64, 96, 3),
                                                  dtype=np.float32)),
        "depth": jnp.asarray(rng.uniform(1, 9, (2, 32, 48, 1)).astype(np.float32)),
    }
    results = []
    for impl in ("xla", "shift"):
        tx = adam_with_l2(step_lr(1e-3, steps_per_epoch=10), 1e-4)
        state = create_train_state(model, variables, tx)
        step = make_train_step(preprocess=False, donate=False, dw_impl=impl)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(3))
        results.append((float(metrics["loss"]),
                        jax.tree_util.tree_leaves(new_state.params)[0]))
    assert np.isclose(results[0][0], results[1][0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(results[0][1]),
                               np.asarray(results[1][1]),
                               rtol=1e-4, atol=1e-5)


def test_split_preprocess_matches_monolith(rng):
    """split_preprocess=True (two chained programs, the large-batch path)
    derives the same rng streams and computes the same update as the
    monolithic one-program step."""
    crop = (32, 48)
    batch = {
        "image": jnp.asarray(rng.integers(0, 256, (2, 480, 640, 3),
                                          dtype=np.uint8)),
        "depth": jnp.asarray(rng.integers(10, 250, (2, 480, 640),
                                          dtype=np.uint8)),
        "num_valid": jnp.asarray(1, jnp.int32),
    }
    key = jax.random.PRNGKey(7)
    results = []
    for split in (False, True):
        # SGD, not Adam: Adam's m/sqrt(v) turns a float-reorder sign flip on
        # a ~1e-9 gradient into a 2*lr param difference, which would make the
        # comparison test compiler fusion rather than our step semantics.
        model = build_model("resnet18", "hu2018")
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.zeros((2, 32, 48, 3)))
        state = create_train_state(model, variables, optax.sgd(1e-3))
        step = make_train_step(preprocess=True, donate=False, crop_hw=crop,
                               split_preprocess=split)
        new_state, metrics = step(state, batch, key)
        results.append((new_state, metrics))
    (s0, m0), (s1, m1) = results
    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]), rtol=1e-5)
    for name in ("abs_rel", "mse", "delta1"):
        np.testing.assert_allclose(float(m0[name]), float(m1[name]), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s0.params),
                    jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-7)


def test_train_loss_decreases_on_fixed_batch(rng):
    model, state = _tiny_state(lr=1e-3)
    step = make_train_step(preprocess=False, donate=False)
    batch = {
        "image": jnp.asarray(rng.standard_normal((2, 32, 48, 3), dtype=np.float32)),
        "depth": jnp.asarray(rng.uniform(1, 9, (2, 16, 24, 1)).astype(np.float32)),
    }
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]


def test_pallas_loss_train_step(rng):
    model, state = _tiny_state()
    step = make_train_step(preprocess=False, donate=False,
                           use_pallas_loss=True, pallas_interpret=True)
    batch = {
        "image": jnp.asarray(rng.standard_normal((2, 32, 48, 3), dtype=np.float32)),
        "depth": jnp.asarray(rng.uniform(1, 9, (2, 16, 24, 1)).astype(np.float32)),
    }
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_eval_step_upsamples_to_label(rng):
    model, state = _tiny_state()
    eval_step = make_eval_step()
    images = jnp.asarray(rng.standard_normal((2, 32, 48, 3), dtype=np.float32))
    depths = jnp.asarray(rng.uniform(1, 9, (2, 32, 48, 1)).astype(np.float32))
    metrics, out = eval_step(state, images, depths)
    assert out.shape == (2, 32, 48, 1)
    assert np.isfinite(float(metrics["abs_rel"]))


def test_step_lr_schedule():
    sched = step_lr(1e-4, steps_per_epoch=100, step_size=5, gamma=0.1)
    assert sched(0) == pytest.approx(1e-4)
    assert sched(499) == pytest.approx(1e-4)
    assert sched(500) == pytest.approx(1e-5)
    assert sched(1000) == pytest.approx(1e-6)


def test_spmd_train_step_on_8_device_mesh(rng):
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    mesh = create_mesh()
    assert mesh.shape["data"] == 8
    assert scale_batch_size(8, mesh) == 64

    model, state = _tiny_state()
    step = make_train_step(preprocess=False, donate=False)
    state = jax.device_put(state, replicated_sharding(mesh))
    batch = shard_batch(
        {
            "image": rng.standard_normal((8, 32, 48, 3)).astype(np.float32),
            "depth": rng.uniform(1, 9, (8, 16, 24, 1)).astype(np.float32),
        },
        mesh,
    )
    assert len(batch["image"].sharding.device_set) == 8
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # params remain replicated after the update
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_zero1_optimizer_sharding_matches_replicated(rng):
    """ZeRO-1 optimizer-state sharding: Adam moments live at 1/8 per device,
    training numerics are identical to the fully-replicated run, and the
    state stays sharded across donated steps."""
    from efficientdepthestimation_tpu.parallel import zero1_state_shardings

    mesh = create_mesh()
    batch_np = {
        "image": rng.standard_normal((8, 32, 48, 3)).astype(np.float32),
        "depth": rng.uniform(1, 9, (8, 16, 24, 1)).astype(np.float32),
    }

    def run(zero1):
        # momentum-SGD, not Adam: the trace state has param-shaped leaves
        # (so ZeRO-1 sharding is exercised) but the update stays *linear* in
        # the gradient — Adam's m/sqrt(v) would turn the ~1e-9 float-reorder
        # differences of a repartitioned reduction into full ±lr sign-flip
        # updates (see test_split_preprocess_matches_monolith).
        model = build_model("resnet18", "hu2018")
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.zeros((2, 32, 48, 3)))
        state = create_train_state(model, variables,
                                   optax.sgd(1e-3, momentum=0.9))
        if zero1:
            shardings = zero1_state_shardings(state, mesh)
            state = jax.device_put(state, shardings)
            step = make_train_step(preprocess=False, donate=True,
                                   state_shardings=shardings)
        else:
            state = jax.device_put(state, replicated_sharding(mesh))
            step = make_train_step(preprocess=False, donate=True)
        batch = shard_batch(dict(batch_np), mesh)
        for i in range(2):
            state, metrics = step(state, batch, jax.random.PRNGKey(0))
        return state, float(metrics["loss"])

    rep_state, rep_loss = run(zero1=False)
    z1_state, z1_loss = run(zero1=True)

    # equal up to float reduction-order epsilon: re-partitioning the update
    # math legitimately reorders conv/psum reductions (~1e-7 per step)
    assert z1_loss == pytest.approx(rep_loss, rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(rep_state.params),
                    jax.tree_util.tree_leaves(z1_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)

    # moments with an 8-divisible dim really live at 1/8 per device, and the
    # out_shardings pin kept them sharded after two donated steps
    mu_leaves = [l for l in jax.tree_util.tree_leaves(z1_state.opt_state)
                 if getattr(l, "ndim", 0) >= 1
                 and any(d % 8 == 0 and d > 0 for d in l.shape)]
    assert mu_leaves, "expected shardable optimizer leaves"
    sharded = [l for l in mu_leaves if not l.sharding.is_fully_replicated]
    assert len(sharded) == len(mu_leaves)
    for l in sharded:
        shard_elems = np.prod(l.sharding.shard_shape(l.shape))
        assert shard_elems * 8 == np.prod(l.shape)
    # params stay replicated (the SPMD forward wants whole weights)
    assert jax.tree_util.tree_leaves(z1_state.params)[0].sharding.is_fully_replicated


def test_mixed_precision_train_step(rng):
    model, state = _tiny_state()
    step = make_train_step(preprocess=False, donate=False, mixed_precision=True)
    batch = {
        "image": jnp.asarray(rng.standard_normal((2, 32, 48, 3), dtype=np.float32)),
        "depth": jnp.asarray(rng.uniform(1, 9, (2, 16, 24, 1)).astype(np.float32)),
    }
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # params remain f32
    assert jax.tree_util.tree_leaves(state.params)[0].dtype == jnp.float32
