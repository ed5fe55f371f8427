"""Checkpoint import round-trips + full-model activation parity vs torch."""

import io

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from efficientdepthestimation_tpu.checkpoints.pth_import import (
    import_pth,
    state_dict_from_variables,
    variables_from_state_dict,
)
from efficientdepthestimation_tpu.models import build_model

from torch_mirror import (
    TorchEfficientNetFeatures,
    TorchHuModel,
    TorchResNetFeatures,
    efficientnet_export_keys,
    randomize_bn_stats,
)


def _save_pth(state_dict, module_prefix=False):
    if module_prefix:
        state_dict = {f"module.{k}": v for k, v in state_dict.items()}
    buf = io.BytesIO()
    torch.save(state_dict, buf)
    buf.seek(0)
    return buf


def _forward_torch(model, x_nchw):
    model.eval()
    with torch.no_grad():
        return model(torch.from_numpy(x_nchw)).numpy()


@pytest.mark.slow
@pytest.mark.parametrize("module_prefix", [False, True])
def test_rn50_hu_checkpoint_parity(rng, module_prefix):
    tm = randomize_bn_stats(
        TorchHuModel(TorchResNetFeatures(), 2048, [256, 512, 1024, 2048])
    )
    buf = _save_pth(tm.state_dict(), module_prefix)

    jm = build_model("resnet50", "hu2018")
    model, variables = import_pth(buf, model=jm, example_input_hw=(228, 304))

    x = rng.standard_normal((1, 228, 304, 3)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))[..., 0]
    theirs = _forward_torch(tm, x.transpose(0, 3, 1, 2))[:, 0]
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_enb0_hu_checkpoint_parity(rng):
    tm = randomize_bn_stats(
        TorchHuModel(TorchEfficientNetFeatures(), 320, [24, 40, 80, 320])
    )
    # E_efficientnet wraps blocks in Sequentials: translate mirror keys
    # (E._conv_stem / E._blocks.i) into the published blocks.* convention.
    sd = efficientnet_export_keys(tm.state_dict(), tm.E.splits)
    buf = _save_pth(sd)

    jm = build_model("efficientnet-b0", "hu2018")
    model, variables = import_pth(buf, model=jm, example_input_hw=(228, 304))

    x = rng.standard_normal((1, 228, 304, 3)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))[..., 0]
    theirs = _forward_torch(tm, x.transpose(0, 3, 1, 2))[:, 0]
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_state_dict_round_trip_midas():
    model = build_model("resnet18", "lasinger2019",
                        output_size=(56, 72), input_size=(112, 144))
    x = jnp.zeros((1, 112, 144, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    variables = jax.tree_util.tree_map(np.asarray, variables)

    sd = state_dict_from_variables(model, variables)
    # MiDaS resnet encoders nest through Sequential indices
    assert "encoder.blocks.0.0.weight" in sd
    assert "encoder.blocks.1.0.0.conv1.weight" in sd
    assert "decoder.blocks.0.res_block1.conv1.weight" in sd

    restored = variables_from_state_dict(model, variables, sd)
    flat_a = jax.tree_util.tree_leaves(variables)
    flat_b = jax.tree_util.tree_leaves(restored)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_state_dict_round_trip_senet_hu():
    model = build_model("senet154", "hu2018")
    x = jnp.zeros((1, 64, 96, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    variables = jax.tree_util.tree_map(np.asarray, variables)

    sd = state_dict_from_variables(model, variables)
    assert "E.base.0.conv1.weight" in sd          # layer0 via base.0
    assert "E.base.1.0.se_module.fc1.weight" in sd
    restored = variables_from_state_dict(model, variables, sd)
    for a, b in zip(jax.tree_util.tree_leaves(variables),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_midas_self_describing_checkpoint():
    # Emulate MidasNet.save's schema (lasinger2019.py:378-392) and reload.
    model = build_model("resnet18", "lasinger2019",
                        output_size=(56, 72), input_size=(112, 144))
    x = jnp.zeros((1, 112, 144, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    sd = state_dict_from_variables(model, jax.tree_util.tree_map(np.asarray, variables))
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    state = {
        "encoder": {"name": "resnet18", "freeze_weights": False},
        "decoder": {"num_features": 64, "non_negative": False},
        "input_size": (144, 112),   # WH
        "output_size": (72, 56),    # WH
        "adversarial_training": False,
        "weights": sd,
        "version": "0.2.0",
    }
    buf = io.BytesIO()
    torch.save(state, buf)
    buf.seek(0)
    model2, variables2 = import_pth(buf, example_input_hw=(112, 144))
    assert model2.output_size == (56, 72)
    out = model2.apply(variables2, x)
    assert out.shape == (1, 56, 72, 1)
