"""The six released checkpoint configurations (README.md:49-56) plus the two
extra full-depth Hu encoders (SENet-154, DenseNet-161), mirrored at FULL
architectural size for parity testing and golden-fixture generation.

Each builder returns (torch_model, checkpoint_buffer, jax_model, input_hw,
encoder_param_key). Weights are deterministic (torch.manual_seed per config)
so the checked-in golden fixtures are reproducible.
"""

import io

import torch

from efficientdepthestimation_tpu.models import build_model

from torch_mirror import (
    TorchDenseNetFeatures,
    TorchEfficientNetFeatures,
    TorchHuModel,
    TorchMidasNet,
    TorchResNetFeatures,
    TorchSENetFeatures,
    densenet_export_keys,
    efficientnet_export_keys,
    randomize_bn_stats,
)

INPUT_HW = (96, 128)  # divisible by 32; small spatial extent keeps CPU
                      # forward/compile sane while the *architecture* is full

CONFIGS = {}


def _config(name):
    def deco(fn):
        CONFIGS[name] = fn
        return fn
    return deco


def _save(obj):
    buf = io.BytesIO()
    torch.save(obj, buf)
    buf.seek(0)
    return buf


def _midas_state(tm, encoder_name, num_features):
    """MidasNet self-describing checkpoint schema (lasinger2019.py:378-392)."""
    h, w = INPUT_HW
    return {
        "encoder": {"name": encoder_name, "freeze_weights": False},
        "decoder": {"num_features": num_features, "non_negative": False},
        "input_size": (w, h),            # WH
        "output_size": (w // 2, h // 2),  # WH
        "adversarial_training": False,
        "weights": tm.state_dict(),
        "version": "0.2.0",
    }


@_config("ENB0-HU")
def _enb0_hu(seed=10):
    torch.manual_seed(seed)
    enc = TorchEfficientNetFeatures("efficientnet-b0")
    tm = randomize_bn_stats(TorchHuModel(enc, 320, [24, 40, 80, 320]), seed=seed)
    buf = _save(efficientnet_export_keys(tm.state_dict(), enc.splits))
    return tm, buf, build_model("efficientnet-b0", "hu2018"), INPUT_HW, "E"


@_config("ENB4-HU")
def _enb4_hu(seed=11):
    torch.manual_seed(seed)
    enc = TorchEfficientNetFeatures("efficientnet-b4")
    assert enc.splits == (0, 6, 10, 22, 32)
    assert enc.block_out_channels == [32, 56, 160, 448]
    tm = randomize_bn_stats(TorchHuModel(enc, 448, [32, 56, 160, 448]), seed=seed)
    buf = _save(efficientnet_export_keys(tm.state_dict(), enc.splits))
    return tm, buf, build_model("efficientnet-b4", "hu2018"), INPUT_HW, "E"


@_config("RN50-HU")
def _rn50_hu(seed=12):
    torch.manual_seed(seed)
    tm = randomize_bn_stats(
        TorchHuModel(TorchResNetFeatures((3, 4, 6, 3)), 2048,
                     [256, 512, 1024, 2048]), seed=seed)
    buf = _save(tm.state_dict())
    return tm, buf, build_model("resnet50", "hu2018"), INPUT_HW, "E"


@_config("SN154-HU")
def _senet_hu(seed=13):
    torch.manual_seed(seed)
    tm = randomize_bn_stats(
        TorchHuModel(TorchSENetFeatures(layers=(3, 8, 36, 3)), 2048,
                     [256, 512, 1024, 2048]), seed=seed)
    # released senet checkpoints use 'se_' keys (reside_model.py:42-43)
    sd = {k.replace("se_module.", "se_"): v for k, v in tm.state_dict().items()}
    buf = _save(sd)
    return tm, buf, build_model("senet154", "hu2018"), INPUT_HW, "E"


@_config("DN161-HU")
def _densenet_hu(seed=14):
    torch.manual_seed(seed)
    tm = randomize_bn_stats(
        TorchHuModel(TorchDenseNetFeatures(96, 48, (6, 12, 36, 24)), 2208,
                     [192, 384, 1056, 2208]), seed=seed)
    buf = _save(densenet_export_keys(tm.state_dict()))
    return tm, buf, build_model("densenet161", "hu2018"), INPUT_HW, "E"


@_config("RN50-LR")
def _rn50_lr(seed=15):
    torch.manual_seed(seed)
    h, w = INPUT_HW
    tm = randomize_bn_stats(
        TorchMidasNet(layers=(3, 4, 6, 3), block_channels=(256, 512, 1024, 2048),
                      output_size_hw=(h // 2, w // 2)), seed=seed)
    buf = _save(_midas_state(tm, "resnet50", 256))
    jm = build_model("resnet50", "lasinger2019",
                     output_size=(h // 2, w // 2), input_size=INPUT_HW)
    return tm, buf, jm, INPUT_HW, "encoder"


def _eff_lr(variant, channels, seed):
    torch.manual_seed(seed)
    h, w = INPUT_HW
    enc = TorchEfficientNetFeatures(variant)
    assert enc.block_out_channels == list(channels)
    tm = randomize_bn_stats(
        TorchMidasNet(block_channels=channels, output_size_hw=(h // 2, w // 2),
                      encoder=enc), seed=seed)
    state = _midas_state(tm, variant, channels[0])
    state["weights"] = efficientnet_export_keys(
        state["weights"], enc.splits, prefix="encoder.")
    jm = build_model(variant, "lasinger2019",
                     output_size=(h // 2, w // 2), input_size=INPUT_HW)
    return tm, _save(state), jm, INPUT_HW, "encoder"


@_config("ENB0-LR")
def _enb0_lr(seed=16):
    return _eff_lr("efficientnet-b0", (24, 40, 80, 320), seed=seed)


@_config("ENB4-LR")
def _enb4_lr(seed=17):
    return _eff_lr("efficientnet-b4", (32, 56, 160, 448), seed=seed)


def torch_taps(tm, x_nchw):
    """Encoder tap activations from a mirror model (eval mode)."""
    tm.eval()
    with torch.no_grad():
        enc = tm.E if hasattr(tm, "E") else tm.encoder
        if hasattr(enc, "blocks"):  # resnet-midas Sequential layout
            taps = []
            t = x_nchw
            for block in enc.blocks:
                t = block(t)
                taps.append(t)
            return [t.numpy() for t in taps]
        return [t.numpy() for t in enc(x_nchw)]
