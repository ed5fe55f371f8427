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
