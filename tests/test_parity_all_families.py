"""Full-model activation parity vs torch for the remaining model families:
SENet-154-HU, DenseNet-161-HU, and ResNet-MidasNet (encoder+decoder)."""

import io

import numpy as np
import pytest

import jax.numpy as jnp
import torch

from efficientdepthestimation_tpu.checkpoints.pth_import import import_pth
from efficientdepthestimation_tpu.models import build_model

from torch_mirror import (
    TorchDenseNetFeatures,
    TorchHuModel,
    TorchMidasNet,
    TorchSENetFeatures,
    densenet_export_keys,
    randomize_bn_stats,
)


def _save(state_dict):
    buf = io.BytesIO()
    torch.save(state_dict, buf)
    buf.seek(0)
    return buf


def _forward_torch(model, x_nchw):
    model.eval()
    with torch.no_grad():
        return model(torch.from_numpy(x_nchw)).numpy()


def test_senet_hu_checkpoint_parity(rng):
    # Shrunken SENet (same block semantics, fewer blocks) to keep CPU time sane.
    tm = randomize_bn_stats(
        TorchHuModel(TorchSENetFeatures(layers=(1, 1, 1, 1)), 2048,
                     [256, 512, 1024, 2048]))
    # the released senet checkpoint stores 'se_' keys that the loaders map to
    # 'se_module.' (reside_model.py:42-43) — emulate that munging
    sd = {k.replace("se_module.", "se_"): v for k, v in tm.state_dict().items()}
    buf = _save(sd)

    from efficientdepthestimation_tpu.models.hu2018 import HuDepthModel
    from efficientdepthestimation_tpu.models.senet import SENetFeatures
    import functools

    jm = HuDepthModel(
        encoder_factory=functools.partial(SENetFeatures, layers=(1, 1, 1, 1)),
        num_features=2048, block_channel=(256, 512, 1024, 2048))
    model, variables = import_pth(buf, model=jm, example_input_hw=(96, 128))

    x = rng.standard_normal((1, 96, 128, 3)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))[..., 0]
    theirs = _forward_torch(tm, x.transpose(0, 3, 1, 2))[:, 0]
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_densenet_hu_checkpoint_parity(rng):
    # Shrunken DenseNet (config (2,2,2,2), growth 16, init 32).
    config, growth, init = (2, 2, 2, 2), 16, 32
    tm = randomize_bn_stats(
        TorchHuModel(TorchDenseNetFeatures(init, growth, config), 64,
                     [32, 32, 32, 64]))
    buf = _save(densenet_export_keys(tm.state_dict()))

    import functools

    from efficientdepthestimation_tpu.models.densenet import DenseNetFeatures
    from efficientdepthestimation_tpu.models.hu2018 import HuDepthModel

    # channels: b1: 32+32=64→32 | b2: 32+32=64→32... recompute: taps are
    # post-transition-conv: (32+2·16)/2=32, (32+32)/2=32, (32+32)/2=32,
    # 32+32=64 final (+norm5) → block_channel (32, 32, 32, 64)
    class TinyDenseNet(DenseNetFeatures):
        pass

    import efficientdepthestimation_tpu.models.densenet as dn

    dn.DENSENET_CONFIGS["tiny"] = (init, growth, config)
    jm = HuDepthModel(
        encoder_factory=functools.partial(DenseNetFeatures, variant="tiny"),
        num_features=64, block_channel=(32, 32, 32, 64))
    model, variables = import_pth(buf, model=jm, example_input_hw=(96, 128))

    x = rng.standard_normal((1, 96, 128, 3)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))[..., 0]
    theirs = _forward_torch(tm, x.transpose(0, 3, 1, 2))[:, 0]
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_midas_resnet_checkpoint_parity(rng):
    tm = randomize_bn_stats(
        TorchMidasNet(layers=(1, 1, 1, 1), block_channels=(256, 512, 1024, 2048),
                      output_size_hw=(56, 72)))
    state = {
        "encoder": {"name": "resnet50", "freeze_weights": False},
        "decoder": {"num_features": 256, "non_negative": False},
        "input_size": (144, 112),
        "output_size": (72, 56),
        "adversarial_training": False,
        "weights": tm.state_dict(),
        "version": "0.2.0",
    }
    buf = io.BytesIO()
    torch.save(state, buf)
    buf.seek(0)

    # rebuild with matching (shrunken) resnet layer counts
    import functools

    from efficientdepthestimation_tpu.models.midas import MidasNet
    from efficientdepthestimation_tpu.models.resnet import (
        RESNET_LAYERS,
        ResNetFeatures,
    )

    RESNET_LAYERS["resnet50-tiny"] = ("bottleneck", (1, 1, 1, 1))
    jm = MidasNet(
        encoder_factory=functools.partial(ResNetFeatures, variant="resnet50-tiny"),
        encoder_block_channels=(256, 512, 1024, 2048),
        output_size=(56, 72), input_size=(112, 144))
    model, variables = import_pth(buf, model=jm, example_input_hw=(112, 144))

    x = rng.standard_normal((1, 112, 144, 3)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))[..., 0]
    theirs = _forward_torch(tm, x.transpose(0, 3, 1, 2))[:, 0]
    assert ours.shape == theirs.shape == (1, 56, 72)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("variant", ["se_resnet50", "se_resnext50_32x4d"])
def test_se_variant_hu_checkpoint_parity(rng, variant):
    """SE-ResNet / SE-ResNeXt rows of the vendored Cadene zoo
    (ReSIDE/models/senet.py:398-453): 7x7 stem, Caffe stride-on-conv1
    (SE-ResNet) / grouped-width conv2 (SE-ResNeXt), 1x1 downsamples.
    Shrunken to one block per stage; depth-only siblings (se_resnet101/152,
    se_resnext101) share these exact block semantics via SENET_CONFIGS."""
    import functools

    from efficientdepthestimation_tpu.models.hu2018 import HuDepthModel
    from efficientdepthestimation_tpu.models.senet import (
        SENET_CONFIGS,
        SENetFeatures,
    )

    cfg = SENET_CONFIGS[variant]
    tm = randomize_bn_stats(
        TorchHuModel(TorchSENetFeatures(
            layers=(1, 1, 1, 1), style=cfg["style"], groups=cfg["groups"],
            inplanes=cfg["inplanes"], input_3x3=cfg["input_3x3"],
            down_kernel=cfg["down_kernel"], down_pad=cfg["down_pad"]),
            2048, [256, 512, 1024, 2048]))
    sd = {k.replace("se_module.", "se_"): v for k, v in tm.state_dict().items()}
    buf = _save(sd)

    jm = HuDepthModel(
        encoder_factory=functools.partial(SENetFeatures, variant=variant,
                                          layers=(1, 1, 1, 1)),
        num_features=2048, block_channel=(256, 512, 1024, 2048))
    model, variables = import_pth(buf, model=jm, example_input_hw=(96, 128))

    x = rng.standard_normal((1, 96, 128, 3)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))[..., 0]
    theirs = _forward_torch(tm, x.transpose(0, 3, 1, 2))[:, 0]
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_se_variant_registry_rows():
    """Every Cadene config row is buildable through the factory."""
    from efficientdepthestimation_tpu.models.registry import encoder_spec
    from efficientdepthestimation_tpu.models.senet import SENET_CONFIGS

    for name in SENET_CONFIGS:
        spec = encoder_spec(name)
        assert spec.block_channels == (256, 512, 1024, 2048)
        assert build_model(name, "hu2018") is not None
