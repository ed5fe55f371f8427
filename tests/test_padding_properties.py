"""Adversarial padding-arithmetic property tests (round-3 hardening).

The architecture-level parity fixtures share an author with the
implementation (tests/torch_mirror.py), so a shared misreading of
efficientnet-pytorch 0.6.3's static same padding or SENet's ceil-mode
pooling could pass silently. These tests check the *arithmetic itself*
against independently-written oracles executed by the installed torch:

- ``same_padding_static`` vs a literal transcription of 0.6.3's
  ``Conv2dStaticSamePadding.__init__`` formula (ZeroPad2d with the extra
  pixel on the right/bottom), swept over resolutions/kernels/strides/
  dilations including every asymmetry class;
- the numeric conv through our padding vs torch's ZeroPad2d+Conv2d(pad=0)
  executed for real;
- SENet's ceil-mode max pool vs ``torch.nn.functional.max_pool2d`` swept
  over the odd/even boundary cases where ceil mode changes the output.

Reference behavior being pinned: ``/root/reference/ReSIDE/models/senet.py``
(pool ceil_mode=True), efficientnet-pytorch 0.6.3 (requirements.txt:8).
"""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from efficientdepthestimation_tpu.ops import conv as C


def _official_static_padding(ih, iw, kh, kw, sh, sw, dh=1, dw=1):
    """Literal transcription of Conv2dStaticSamePadding (0.6.3).

    Returns ZeroPad2d's (left, right, top, bottom).
    """
    oh, ow = int(np.ceil(ih / sh)), int(np.ceil(iw / sw))
    pad_h = max((oh - 1) * sh + (kh - 1) * dh + 1 - ih, 0)
    pad_w = max((ow - 1) * sw + (kw - 1) * dw + 1 - iw, 0)
    return (pad_w // 2, pad_w - pad_w // 2, pad_h // 2, pad_h - pad_h // 2)


# resolutions hit every parity/stride-remainder class, incl. the real tap
# sizes of 228×304 and 380×380 nets and primes that make size % stride ≠ 0
_RESOLUTIONS = [(224, 224), (228, 304), (114, 152), (57, 76), (29, 38),
                (15, 19), (8, 10), (380, 380), (190, 190), (95, 95),
                (48, 24), (7, 7), (13, 17)]
_KERNELS = [1, 3, 5]
_STRIDES = [1, 2]


def test_same_padding_static_matches_official_formula_sweep():
    for (ih, iw), k, s in itertools.product(_RESOLUTIONS, _KERNELS, _STRIDES):
        left, right, top, bottom = _official_static_padding(ih, iw, k, k, s, s)
        ours = C.same_padding_static((ih, iw), (k, k), (s, s))
        assert ours == ((top, bottom), (left, right)), (
            f"hw={ih, iw} k={k} s={s}: ours={ours} "
            f"official(l,r,t,b)={left, right, top, bottom}")


def test_same_padding_static_dilation_matches_official_formula():
    for (ih, iw), k, s, d in itertools.product(
            [(29, 38), (57, 76)], [3, 5], [1, 2], [2, 3]):
        left, right, top, bottom = _official_static_padding(
            ih, iw, k, k, s, s, d, d)
        ours = C.same_padding_static((ih, iw), (k, k), (s, s), (d, d))
        assert ours == ((top, bottom), (left, right))


def test_asymmetry_lands_on_right_and_bottom():
    # k=3 s=2 even size → total pad 1, and 0.6.3 puts it right/bottom
    (top, bottom), (left, right) = C.same_padding_static(
        (224, 224), (3, 3), (2, 2))
    assert (top, left) == (0, 0) and (bottom, right) == (1, 1)


@pytest.mark.parametrize("hw,k,s", [
    ((224, 224), 3, 2),   # asymmetric (0,1)
    ((57, 76), 3, 2),     # mixed symmetric/asymmetric axes
    ((28, 28), 5, 2),     # asymmetric (1,2)
    ((29, 38), 5, 2),     # odd sizes
    ((15, 19), 5, 1),     # stride-1 full padding
    ((13, 17), 3, 2),     # primes
])
def test_static_same_conv_numeric_vs_torch_zeropad(rng, hw, k, s):
    """Execute both pipelines: ours vs torch ZeroPad2d + Conv2d(padding=0)."""
    cin, cout = 3, 4
    x = rng.standard_normal((2, *hw, cin), dtype=np.float32)
    w = rng.standard_normal((k, k, cin, cout), dtype=np.float32)
    pad = C.same_padding_static(hw, (k, k), (s, s))
    ours = np.asarray(C.conv2d(jnp.asarray(x), jnp.asarray(w), stride=s,
                               padding=pad))

    left, right, top, bottom = _official_static_padding(*hw, k, k, s, s)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    xt = F.pad(xt, (left, right, top, bottom))
    wt = torch.from_numpy(w.transpose(3, 2, 0, 1))
    theirs = F.conv2d(xt, wt, stride=s, padding=0)
    theirs = theirs.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("hw", [(7, 7), (8, 8), (9, 9), (113, 151),
                                (114, 152), (115, 153), (116, 154),
                                (57, 76), (13, 17)])
@pytest.mark.parametrize("window,stride,pad", [(3, 2, 0), (3, 2, 1), (2, 2, 0)])
def test_ceil_mode_pool_matches_torch_sweep(rng, hw, window, stride, pad):
    """SENet's pool(3, 2, ceil_mode=True) arithmetic vs real torch, swept
    across every size-parity class where ceil mode changes the output."""
    x = rng.standard_normal((2, *hw, 3), dtype=np.float32)
    ours = np.asarray(C.max_pool(jnp.asarray(x), window, stride, padding=pad,
                                 ceil_mode=True))
    theirs = F.max_pool2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                          window, stride, pad, ceil_mode=True)
    theirs = theirs.numpy().transpose(0, 2, 3, 1)
    assert ours.shape == theirs.shape, (hw, window, stride, pad)
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)


def test_floor_vs_ceil_shapes_differ_where_expected():
    # sanity on the oracle itself: ceil mode adds a window iff the last
    # window start (stride grid) falls inside the unpadded input tail
    # (8-3) % 2 != 0 → ceil adds a window; (7-3) % 2 == 0 → identical
    floor8 = C.max_pool(jnp.zeros((1, 8, 8, 1)), 3, 2, padding=0, ceil_mode=False)
    ceil8 = C.max_pool(jnp.zeros((1, 8, 8, 1)), 3, 2, padding=0, ceil_mode=True)
    assert floor8.shape == (1, 3, 3, 1)
    assert ceil8.shape == (1, 4, 4, 1)
    floor7 = C.max_pool(jnp.zeros((1, 7, 7, 1)), 3, 2, padding=0, ceil_mode=False)
    ceil7 = C.max_pool(jnp.zeros((1, 7, 7, 1)), 3, 2, padding=0, ceil_mode=True)
    assert floor7.shape == ceil7.shape == (1, 3, 3, 1)
