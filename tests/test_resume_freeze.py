"""Train-state resume round-trip + encoder freezing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficientdepthestimation_tpu.checkpoints.serialization import (
    load_train_state,
    save_train_state,
)
from efficientdepthestimation_tpu.models import build_model
from efficientdepthestimation_tpu.training.train_step import (
    adam_with_l2,
    create_train_state,
    make_train_step,
)


def _state(frozen=()):
    model = build_model("resnet18", "hu2018")
    x = jnp.zeros((2, 32, 48, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    tx = adam_with_l2(1e-3, 1e-4, frozen_prefixes=frozen)
    return model, create_train_state(model, variables, tx)


def _batch(rng):
    return {
        "image": jnp.asarray(rng.standard_normal((2, 32, 48, 3), dtype=np.float32)),
        "depth": jnp.asarray(rng.uniform(1, 9, (2, 16, 24, 1)).astype(np.float32)),
    }


@pytest.mark.slow
def test_train_state_resume_round_trip(tmp_path, rng):
    model, state = _state()
    step = make_train_step(preprocess=False, donate=False)
    batch = _batch(rng)
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    state, _ = step(state, batch, jax.random.PRNGKey(0))

    path = str(tmp_path / "train_state.ede")
    save_train_state(path, state, encoder="resnet18", decoder="hu2018", epoch=3)

    _, fresh = _state()
    restored, header = load_train_state(path, fresh)
    assert header["epoch"] == 3
    assert int(restored.step) == 2
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer moments restored too → next update identical
    s1, m1 = step(state, batch, jax.random.PRNGKey(1))
    s2, m2 = step(restored, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_freeze_encoder_blocks_updates(rng):
    model, state = _state(frozen=("E",))
    step = make_train_step(preprocess=False, donate=False)
    enc_before = np.asarray(state.params["E"]["conv1"]["kernel"]).copy()
    dec_before = np.asarray(state.params["D"]["conv"]["kernel"]).copy()
    state, _ = step(state, _batch(rng), jax.random.PRNGKey(0))
    np.testing.assert_array_equal(
        np.asarray(state.params["E"]["conv1"]["kernel"]), enc_before)
    assert not np.allclose(
        np.asarray(state.params["D"]["conv"]["kernel"]), dec_before)
