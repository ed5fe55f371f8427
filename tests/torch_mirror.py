"""Test-only torch models reproducing the reference architectures' state-dict
keys and forward numerics, built from bare ``torch.nn`` (torchvision /
efficientnet_pytorch are not installed in this environment).

These act as the ground truth for checkpoint-import round-trips and
full-model activation parity: random-weight torch checkpoints are imported
into the JAX models and outputs compared on fixed inputs.
"""

from collections import OrderedDict
import math

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# ResNet (torchvision-v1 semantics)
# ---------------------------------------------------------------------------


class TorchBottleneck(nn.Module):
    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        if stride != 1 or cin != planes * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )
        else:
            self.downsample = None

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        r = self.downsample(x) if self.downsample is not None else x
        return F.relu(y + r)


class TorchResNetFeatures(nn.Module):
    """ResNet-50-style 4-tap backbone (layers configurable)."""

    def __init__(self, layers=(3, 4, 6, 3)):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cin = 64
        for stage, (planes, n) in enumerate(zip((64, 128, 256, 512), layers)):
            blocks = []
            for i in range(n):
                stride = 1 if (stage == 0 or i > 0) else 2
                blocks.append(TorchBottleneck(cin, planes, stride))
                cin = planes * 4
            setattr(self, f"layer{stage + 1}", nn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        t1 = self.layer1(x)
        t2 = self.layer2(t1)
        t3 = self.layer3(t2)
        t4 = self.layer4(t3)
        return t1, t2, t3, t4


# ---------------------------------------------------------------------------
# EfficientNet (efficientnet_pytorch 0.6.3 semantics: global static padding)
# ---------------------------------------------------------------------------


def _same_pad(res, k, s):
    out = math.ceil(res / s)
    total = max((out - 1) * s + k - res, 0)
    return (total // 2, total - total // 2)


class TorchMBConv(nn.Module):
    def __init__(self, cin, cout, k, s, expand, se_ratio, res):
        super().__init__()
        self.cin, self.cout, self.k, self.s, self.expand = cin, cout, k, s, expand
        mid = cin * expand
        if expand != 1:
            self._expand_conv = nn.Conv2d(cin, mid, 1, bias=False)
            self._bn0 = nn.BatchNorm2d(mid, eps=1e-3, momentum=0.01)
        self.pad = _same_pad(res, k, s)
        self._depthwise_conv = nn.Conv2d(mid, mid, k, s, 0, groups=mid, bias=False)
        self._bn1 = nn.BatchNorm2d(mid, eps=1e-3, momentum=0.01)
        n_sq = max(1, int(cin * se_ratio))
        self._se_reduce = nn.Conv2d(mid, n_sq, 1)
        self._se_expand = nn.Conv2d(n_sq, mid, 1)
        self._project_conv = nn.Conv2d(mid, cout, 1, bias=False)
        self._bn2 = nn.BatchNorm2d(cout, eps=1e-3, momentum=0.01)

    def forward(self, x):
        inp = x
        swish = lambda t: t * torch.sigmoid(t)
        if self.expand != 1:
            x = swish(self._bn0(self._expand_conv(x)))
        ph, pw = self.pad, self.pad
        x = F.pad(x, (pw[0], pw[1], ph[0], ph[1]))
        x = swish(self._bn1(self._depthwise_conv(x)))
        se = F.adaptive_avg_pool2d(x, 1)
        se = self._se_expand(swish(self._se_reduce(se)))
        x = torch.sigmoid(se) * x
        x = self._bn2(self._project_conv(x))
        if self.s == 1 and self.cin == self.cout:
            x = x + inp
        return x


def _round_filters(filters, width_mult, divisor=8):
    """efficientnet_pytorch 0.6.3 round_filters (utils.py of that package)."""
    filters *= width_mult
    new_filters = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_filters < 0.9 * filters:
        new_filters += divisor
    return int(new_filters)


def _round_repeats(repeats, depth_mult):
    return int(math.ceil(depth_mult * repeats))


class TorchEfficientNetFeatures(nn.Module):
    """EfficientNet feature extractor with the reference's 4-way split.

    Parameterized over (width, depth, resolution, splits) so both the
    released B0 (16 blocks, splits 3/5/8) and B4 (width 1.4 / depth 1.8 /
    380 px, 32 blocks, splits 6/10/22 — ReSIDE/models/modules.py:168-183)
    configurations are mirrored at full size.
    """

    STAGES = (
        (1, 3, 1, 1, 32, 16, 0.25),
        (2, 3, 2, 6, 16, 24, 0.25),
        (2, 5, 2, 6, 24, 40, 0.25),
        (3, 3, 2, 6, 40, 80, 0.25),
        (3, 5, 1, 6, 80, 112, 0.25),
        (4, 5, 2, 6, 112, 192, 0.25),
        (1, 3, 1, 6, 192, 320, 0.25),
    )
    VARIANTS = {  # width, depth, canonical resolution, 4-way split starts
        "efficientnet-b0": (1.0, 1.0, 224, (0, 3, 5, 8)),
        "efficientnet-b4": (1.4, 1.8, 380, (0, 6, 10, 22)),
    }

    def __init__(self, variant="efficientnet-b0"):
        super().__init__()
        width, depth, res, splits = self.VARIANTS[variant]
        stem_out = _round_filters(32, width)
        self.stem_pad = _same_pad(res, 3, 2)
        self._conv_stem = nn.Conv2d(3, stem_out, 3, 2, 0, bias=False)
        self._bn0 = nn.BatchNorm2d(stem_out, eps=1e-3, momentum=0.01)
        blocks = []
        for r, k, s, e, cin, cout, se in self.STAGES:
            cin_r, cout_r = _round_filters(cin, width), _round_filters(cout, width)
            for i in range(_round_repeats(r, depth)):
                blocks.append(
                    TorchMBConv(cin_r if i == 0 else cout_r, cout_r, k,
                                s if i == 0 else 1, e, se, res)
                )
        self._blocks = nn.ModuleList(blocks)
        self.splits = tuple(splits) + (len(blocks),)
        self.block_out_channels = [
            self._blocks[b - 1].cout for b in self.splits[1:]]

    def forward(self, x):
        swish = lambda t: t * torch.sigmoid(t)
        p = self.stem_pad
        x = F.pad(x, (p[0], p[1], p[0], p[1]))
        x = swish(self._bn0(self._conv_stem(x)))
        taps = []
        for i, b in enumerate(self._blocks):
            x = b(x)
            if i + 1 in self.splits[1:]:
                taps.append(x)
        return taps


def efficientnet_export_keys(state_dict, splits, prefix="E."):
    """Translate mirror keys (E._conv_stem / E._blocks.i) into the published
    E_efficientnet Sequential convention (E.blocks.g.j — modules.py:124-200):
    group 0 = [stem conv, stem bn, blocks[:split1]], groups 1-3 = the
    remaining split ranges."""
    out = {}
    for key, value in state_dict.items():
        if key.startswith(prefix):
            rest = key[len(prefix):]
            if rest.startswith("_conv_stem."):
                key = prefix + "blocks.0.0." + rest[len("_conv_stem."):]
            elif rest.startswith("_bn0."):
                key = prefix + "blocks.0.1." + rest[len("_bn0."):]
            elif rest.startswith("_blocks."):
                parts = rest.split(".")
                j = int(parts[1])
                tail = ".".join(parts[2:])
                if j < splits[1]:
                    key = f"{prefix}blocks.0.{2 + j}.{tail}"
                else:
                    for g in range(1, 4):
                        if splits[g] <= j < splits[g + 1]:
                            key = f"{prefix}blocks.{g}.{j - splits[g]}.{tail}"
                            break
        out[key] = value
    return out


# ---------------------------------------------------------------------------
# Hu2018 decoder stack
# ---------------------------------------------------------------------------


class TorchUpProjection(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 5, 1, 2, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv1_2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn1_2 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cin, cout, 5, 1, 2, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)

    def forward(self, x, size):
        x = F.interpolate(x, size=size, mode="bilinear", align_corners=True)
        a = self.bn1_2(self.conv1_2(F.relu(self.bn1(self.conv1(x)))))
        b = self.bn2(self.conv2(x))
        return F.relu(a + b)


class TorchHuModel(nn.Module):
    def __init__(self, encoder, num_features, block_channel):
        super().__init__()
        self.E = encoder
        f = num_features // 2
        self.D = nn.Module()
        self.D.conv = nn.Conv2d(num_features, f, 1, bias=False)
        self.D.bn = nn.BatchNorm2d(f)
        self.D.up1 = TorchUpProjection(f, f // 2)
        self.D.up2 = TorchUpProjection(f // 2, f // 4)
        self.D.up3 = TorchUpProjection(f // 4, f // 8)
        self.D.up4 = TorchUpProjection(f // 8, f // 16)
        self.MFF = nn.Module()
        for i, c in enumerate(block_channel):
            setattr(self.MFF, f"up{i + 1}", TorchUpProjection(c, 16))
        self.MFF.conv = nn.Conv2d(64, 64, 5, 1, 2, bias=False)
        self.MFF.bn = nn.BatchNorm2d(64)
        r = 64 + block_channel[3] // 32
        self.R = nn.Module()
        self.R.conv0 = nn.Conv2d(r, r, 5, 1, 2, bias=False)
        self.R.bn0 = nn.BatchNorm2d(r)
        self.R.conv1 = nn.Conv2d(r, r, 5, 1, 2, bias=False)
        self.R.bn1 = nn.BatchNorm2d(r)
        self.R.conv2 = nn.Conv2d(r, 1, 5, 1, 2, bias=True)

    def forward(self, x):
        t1, t2, t3, t4 = self.E(x)
        d = F.relu(self.D.bn(self.D.conv(t4)))
        d = self.D.up1(d, t3.shape[2:])
        d = self.D.up2(d, t2.shape[2:])
        d = self.D.up3(d, t1.shape[2:])
        d = self.D.up4(d, (t1.shape[2] * 2, t1.shape[3] * 2))
        size = d.shape[2:]
        m = torch.cat([
            self.MFF.up1(t1, size), self.MFF.up2(t2, size),
            self.MFF.up3(t3, size), self.MFF.up4(t4, size),
        ], 1)
        m = F.relu(self.MFF.bn(self.MFF.conv(m)))
        y = torch.cat([d, m], 1)
        y = F.relu(self.R.bn0(self.R.conv0(y)))
        y = F.relu(self.R.bn1(self.R.conv1(y)))
        return self.R.conv2(y)


def randomize_bn_stats(model, seed=0):
    """Give BN layers non-trivial running stats so eval parity is meaningful."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.3)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)
    return model


# ---------------------------------------------------------------------------
# SENet-154 (Cadene semantics: 3×3 stem trio, ceil-mode pool, grouped blocks)
# ---------------------------------------------------------------------------


class TorchSEBottleneck(nn.Module):
    def __init__(self, cin, planes, stride=1, groups=64, reduction=16,
                 down_kernel=1, down_pad=0, style="senet", base_width=4):
        super().__init__()
        if style == "senet":
            w1, w2 = planes * 2, planes * 4
            s1, s2 = 1, stride
        elif style == "se_resnet":
            w1 = w2 = planes
            s1, s2 = stride, 1  # Caffe stride placement (senet.py:160-177)
        elif style == "se_resnext":
            w1 = w2 = int(planes * base_width / 64) * groups
            s1, s2 = 1, stride
        else:
            raise ValueError(style)
        self.conv1 = nn.Conv2d(cin, w1, 1, s1, bias=False)
        self.bn1 = nn.BatchNorm2d(w1)
        self.conv2 = nn.Conv2d(w1, w2, 3, s2, 1,
                               groups=groups, bias=False)
        self.bn2 = nn.BatchNorm2d(w2)
        self.conv3 = nn.Conv2d(w2, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.se_module = nn.Module()
        self.se_module.fc1 = nn.Conv2d(planes * 4, planes * 4 // reduction, 1)
        self.se_module.fc2 = nn.Conv2d(planes * 4 // reduction, planes * 4, 1)
        if stride != 1 or cin != planes * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes * 4, down_kernel, stride, down_pad,
                          bias=False),
                nn.BatchNorm2d(planes * 4))
        else:
            self.downsample = None

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        se = F.adaptive_avg_pool2d(y, 1)
        se = torch.sigmoid(self.se_module.fc2(F.relu(self.se_module.fc1(se))))
        y = y * se
        r = self.downsample(x) if self.downsample is not None else x
        return F.relu(y + r)


class TorchSENetFeatures(nn.Module):
    """Publishes keys through a `base` Sequential like E_senet does."""

    def __init__(self, layers=(3, 8, 36, 3), style="senet", groups=64,
                 inplanes=128, input_3x3=True, down_kernel=3, down_pad=1):
        super().__init__()
        from collections import OrderedDict as OD

        if input_3x3:
            stem = [
                ("conv1", nn.Conv2d(3, 64, 3, 2, 1, bias=False)),
                ("bn1", nn.BatchNorm2d(64)),
                ("relu1", nn.ReLU()),
                ("conv2", nn.Conv2d(64, 64, 3, 1, 1, bias=False)),
                ("bn2", nn.BatchNorm2d(64)),
                ("relu2", nn.ReLU()),
                ("conv3", nn.Conv2d(64, inplanes, 3, 1, 1, bias=False)),
                ("bn3", nn.BatchNorm2d(inplanes)),
                ("relu3", nn.ReLU()),
            ]
        else:
            stem = [
                ("conv1", nn.Conv2d(3, inplanes, 7, 2, 3, bias=False)),
                ("bn1", nn.BatchNorm2d(inplanes)),
                ("relu1", nn.ReLU()),
            ]
        layer0 = nn.Sequential(OD(
            stem + [("pool", nn.MaxPool2d(3, 2, ceil_mode=True))]))
        stages = [layer0]
        cin = inplanes
        for stage, (planes, n) in enumerate(zip((64, 128, 256, 512), layers)):
            blocks = []
            for i in range(n):
                stride = 1 if (stage == 0 or i > 0) else 2
                dk, dp = (1, 0) if stage == 0 else (down_kernel, down_pad)
                blocks.append(TorchSEBottleneck(cin, planes, stride,
                                                groups=groups, down_kernel=dk,
                                                down_pad=dp, style=style))
                cin = planes * 4
            stages.append(nn.Sequential(*blocks))
        self.base = nn.Sequential(*stages)

    def forward(self, x):
        x = self.base[0](x)
        t1 = self.base[1](x)
        t2 = self.base[2](t1)
        t3 = self.base[3](t2)
        t4 = self.base[4](t3)
        return t1, t2, t3, t4


# ---------------------------------------------------------------------------
# DenseNet-161 (vendored old-torchvision semantics; dotted key names are
# produced by renaming on export since modern torch forbids '.' in names)
# ---------------------------------------------------------------------------


class TorchDenseLayer(nn.Module):
    def __init__(self, cin, growth, bn_size=4):
        super().__init__()
        self.norm1 = nn.BatchNorm2d(cin)
        self.conv1 = nn.Conv2d(cin, bn_size * growth, 1, bias=False)
        self.norm2 = nn.BatchNorm2d(bn_size * growth)
        self.conv2 = nn.Conv2d(bn_size * growth, growth, 3, 1, 1, bias=False)

    def forward(self, x):
        y = self.conv1(F.relu(self.norm1(x)))
        y = self.conv2(F.relu(self.norm2(y)))
        return torch.cat([x, y], 1)


class TorchDenseNetFeatures(nn.Module):
    """DenseNet-161-shaped with E_densenet's mid-transition taps."""

    def __init__(self, init=96, growth=48, config=(6, 12, 36, 24)):
        super().__init__()
        from collections import OrderedDict as OD

        self.features = nn.Module()
        self.features.conv0 = nn.Conv2d(3, init, 7, 2, 3, bias=False)
        self.features.norm0 = nn.BatchNorm2d(init)
        c = init
        self.config = config
        for bi, n in enumerate(config):
            block = nn.Module()
            for li in range(n):
                block.add_module(f"denselayer{li + 1}",
                                 TorchDenseLayer(c + li * growth, growth))
            setattr(self.features, f"denseblock{bi + 1}", block)
            c += n * growth
            if bi < 3:
                trans = nn.Module()
                trans.norm = nn.BatchNorm2d(c)
                trans.conv = nn.Conv2d(c, c // 2, 1, bias=False)
                setattr(self.features, f"transition{bi + 1}", trans)
                c = c // 2
            else:
                self.features.norm5 = nn.BatchNorm2d(c)

    def forward(self, x):
        f = self.features
        x = F.max_pool2d(F.relu(f.norm0(f.conv0(x))), 3, 2, 1)
        taps = []
        for bi, n in enumerate(self.config):
            block = getattr(f, f"denseblock{bi + 1}")
            for li in range(n):
                x = getattr(block, f"denselayer{li + 1}")(x)
            if bi < 3:
                trans = getattr(f, f"transition{bi + 1}")
                x = trans.conv(F.relu(trans.norm(x)))
                taps.append(x)
                x = F.avg_pool2d(x, 2, 2)
            else:
                x = F.relu(f.norm5(x))
                taps.append(x)
        return taps


def densenet_export_keys(state_dict):
    """Rename denselayer norm1/conv1 → the vendored dotted convention."""
    out = {}
    for key, value in state_dict.items():
        if "denselayer" in key:
            for a, b in (("norm1", "norm.1"), ("conv1", "conv.1"),
                         ("norm2", "norm.2"), ("conv2", "conv.2")):
                key = key.replace(f".{a}.", f".{b}.")
        out[key] = value
    return out


# ---------------------------------------------------------------------------
# MiDaS decoder (+ assembled MidasNet with Sequential-wrapped encoders)
# ---------------------------------------------------------------------------


class TorchResidualBlock(nn.Module):
    def __init__(self, cin, cout=None, stride=1):
        super().__init__()
        cout = cout or cin
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        if cin != cout:
            self.down_sample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))
        else:
            self.down_sample = None

    def forward(self, x):
        y = F.relu(x)
        y = F.relu(self.bn1(self.conv1(y)))
        y = self.bn2(self.conv2(y))
        return y + (self.down_sample(x) if self.down_sample is not None else x)


class TorchDecoderBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.res_block1 = TorchResidualBlock(cin, cout)
        self.res_block2 = TorchResidualBlock(cout)

    def forward(self, enc, prev, size):
        if prev is None:
            out = self.res_block1(enc)
        else:
            out = prev + self.res_block1(enc)
            out = self.res_block2(out)
        return F.interpolate(out, size=size, mode="bilinear", align_corners=True)


class TorchMidasNet(nn.Module):
    """MidasNet mirror with the reference's Sequential key layout.

    Default encoder is ResNet (lasinger2019.py:107-111 key layout). Pass
    ``encoder`` (any taps-returning module, e.g. TorchEfficientNetFeatures)
    for the efficientnet variants — its keys land under ``encoder.*`` and are
    translated to the ``encoder.blocks.g.j`` convention at export time via
    ``efficientnet_export_keys(sd, splits, prefix="encoder.")``.
    """

    def __init__(self, layers=(2, 2, 2, 2), block_channels=(256, 512, 1024, 2048),
                 output_size_hw=(56, 72), encoder=None):
        super().__init__()
        if encoder is not None:
            self.encoder = encoder
            self._taps_encoder = True
        else:
            rn = TorchResNetFeatures(layers)
            self.encoder = nn.Module()
            self.encoder.blocks = nn.ModuleList([
                nn.Sequential(rn.conv1, rn.bn1, nn.ReLU(), rn.maxpool, rn.layer1),
                nn.Sequential(rn.layer2),
                nn.Sequential(rn.layer3),
                nn.Sequential(rn.layer4),
            ])
            self._taps_encoder = False
        f = block_channels[0]
        self.decoder = nn.Module()
        self.decoder.blocks = nn.ModuleList([
            TorchDecoderBlock(c, f) for c in reversed(block_channels)])
        self.decoder.conv1 = nn.Conv2d(f, 128, 3, 1, 1, bias=False)
        self.decoder.bn1 = nn.BatchNorm2d(128)
        self.decoder.conv2 = nn.Conv2d(128, 32, 3, 1, 1, bias=False)
        self.decoder.bn2 = nn.BatchNorm2d(32)
        self.decoder.conv3 = nn.Conv2d(32, 1, 1, bias=True)
        self.output_size_hw = output_size_hw

    def forward(self, x):
        if self._taps_encoder:
            taps = list(self.encoder(x))
        else:
            taps = []
            for block in self.encoder.blocks:
                x = block(x)
                taps.append(x)
        sizes = [t.shape[-2:] for t in reversed(taps[:-1])]
        sizes.append((sizes[-1][0] * 2, sizes[-1][1] * 2))
        out = None
        for block, enc, size in zip(self.decoder.blocks, reversed(taps), sizes):
            out = block(enc, out, size)
        out = F.relu(self.decoder.bn1(self.decoder.conv1(out)))
        out = F.interpolate(out, size=self.output_size_hw, mode="bilinear",
                            align_corners=True)
        out = F.relu(self.decoder.bn2(self.decoder.conv2(out)))
        return self.decoder.conv3(out)
