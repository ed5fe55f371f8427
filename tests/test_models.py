"""Architecture tests: tap channels, output shapes, param-tree structure."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficientdepthestimation_tpu.models import build_model
from efficientdepthestimation_tpu.models.densenet import densenet_block_channels
from efficientdepthestimation_tpu.models.efficientnet import (
    EfficientNetFeatures,
    efficientnet_block_channels,
    efficientnet_stage_splits,
    round_filters,
    round_repeats,
)
from efficientdepthestimation_tpu.models.registry import (
    encoder_spec,
    parse_checkpoint_name,
)
from efficientdepthestimation_tpu.models.resnet import resnet_block_channels


def test_block_channel_constants_match_reference():
    # ReSIDE/train.py:25-33
    assert resnet_block_channels("resnet50") == [256, 512, 1024, 2048]
    assert densenet_block_channels("densenet161") == [192, 384, 1056, 2208]
    assert encoder_spec("senet").block_channels == (256, 512, 1024, 2048)
    # efficientnet-pytorch round_filters over the reference split indices
    assert efficientnet_block_channels("efficientnet-b0") == [24, 40, 80, 320]
    assert efficientnet_block_channels("efficientnet-b4") == [32, 56, 160, 448]


def test_efficientnet_scaling_rules():
    assert round_filters(32, 1.4) == 48     # B4 stem
    assert round_filters(192, 1.4) == 272
    assert round_repeats(3, 1.8) == 6
    assert efficientnet_stage_splits("efficientnet-b0") == [0, 3, 5, 8, 16]
    assert efficientnet_stage_splits("efficientnet-b4") == [0, 6, 10, 22, 32]


def test_checkpoint_name_parsing():
    assert parse_checkpoint_name("ENB0-HU.pth") == ("efficientnet-b0", "hu2018")
    assert parse_checkpoint_name("/x/RN50-LR.pth") == ("resnet50", "lasinger2019")
    with pytest.raises(ValueError):
        parse_checkpoint_name("garbage.pth")


def _init_and_forward(model, shape, train=False):
    x = jnp.zeros(shape, jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x
    )
    out = model.apply(variables, x, train)
    return variables, out


@pytest.mark.parametrize("encoder", ["efficientnet-b0", "resnet50"])
def test_hu_model_output_is_half_resolution(encoder):
    model = build_model(encoder, "hu2018")
    _, out = _init_and_forward(model, (1, 228, 304, 3))
    assert out.shape == (1, 114, 152, 1)


def test_hu_model_small_encoders_forward():
    model = build_model("resnet18", "hu2018")
    _, out = _init_and_forward(model, (1, 64, 96, 3))
    assert out.shape == (1, 32, 48, 1)


@pytest.mark.slow
def test_hu_model_deep_encoders_forward():
    # full-depth SENet-154 / DenseNet-161 init+compile is ~100 s on this
    # 1-core host; their numerics are covered by the (slow) full-size parity
    # tests, so the forward-shape check rides the slow tier too
    for encoder in ["senet154", "densenet161"]:
        model = build_model(encoder, "hu2018")
        _, out = _init_and_forward(model, (1, 64, 96, 3))
        assert out.shape == (1, 32, 48, 1)


def test_midas_model_output_size():
    model = build_model("efficientnet-b0", "lasinger2019",
                        output_size=(114, 152), input_size=(228, 304))
    _, out = _init_and_forward(model, (1, 228, 304, 3))
    assert out.shape == (1, 114, 152, 1)


def test_efficientnet_tap_shapes_static_padding():
    # Static (0.6.3-style) padding gives 28×38 / 14×19 / 7×9 deep taps for
    # 228×304 inputs — a consequence of canonical-size padding the decoders
    # absorb via activation-driven sizes.
    enc = EfficientNetFeatures(variant="efficientnet-b0")
    x = jnp.zeros((1, 228, 304, 3))
    variables = enc.init({"params": jax.random.PRNGKey(0)}, x)
    taps = enc.apply(variables, x)
    assert [t.shape[1:3] for t in taps] == [(57, 76), (28, 38), (14, 19), (7, 9)]
    assert [t.shape[-1] for t in taps] == [24, 40, 80, 320]


def test_param_tree_uses_torch_style_names():
    model = build_model("resnet50", "hu2018")
    x = jnp.zeros((1, 64, 96, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    params = variables["params"]
    assert "E" in params and "D" in params and "MFF" in params and "R" in params
    assert "layer1.0" in params["E"]
    assert "downsample.0" in params["E"]["layer1.0"]
    assert set(params["E"]["conv1"].keys()) == {"kernel"}
    assert "up1" in params["D"] and "conv1_2" in params["D"]["up1"]
