"""FULL-SIZE activation parity for all six released checkpoint configurations
(ENB0/ENB4/RN50 × HU/LR, README.md:49-56) plus full-depth SENet-154-HU and
DenseNet-161-HU — VERDICT round-1 item 2.

Three-way certification per config:
  1. the torch mirror reproduces the checked-in golden fixture (determinism
     guard — catches silent torch/mirror drift),
  2. the imported JAX model matches the torch mirror per encoder tap and on
     the final output (the parity claim, ≤1e-4),
  3. the JAX output matches the fixture (so the fixture alone certifies
     future rounds without re-running torch).

Architectures are at full depth/width (B4: width 1.4 / depth 1.8 / 32 blocks
/ split (0,6,10,22); SENet (3,8,36,3); RN50 (3,4,6,3); DN161 (6,12,36,24));
only the spatial input is small (96×128) to keep CPU time sane — the padding
and split semantics VERDICT flagged are input-size independent.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp
import torch

from efficientdepthestimation_tpu.checkpoints.pth_import import import_pth

from full_size_configs import CONFIGS, torch_taps
from make_golden_fixtures import FIXTURE_PATH, digest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def fixtures():
    if not os.path.isfile(FIXTURE_PATH):
        pytest.fail(
            "golden fixtures missing — run: python tests/make_golden_fixtures.py")
    return dict(np.load(FIXTURE_PATH))


def _jax_taps(jm, variables, encoder_key, x):
    enc = jm.encoder_factory()
    enc_vars = {"params": variables["params"][encoder_key]}
    if encoder_key in variables.get("batch_stats", {}):
        enc_vars["batch_stats"] = variables["batch_stats"][encoder_key]
    return [np.asarray(t) for t in enc.apply(enc_vars, jnp.asarray(x))]


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_full_size_parity(name, fixtures):
    tm, buf, jm, input_hw, encoder_key = CONFIGS[name]()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, *input_hw, 3)).astype(np.float32)
    x_nchw = torch.from_numpy(x.transpose(0, 3, 1, 2))

    # 1. torch mirror vs checked-in fixture (determinism guard)
    tm.eval()
    with torch.no_grad():
        theirs = tm(x_nchw).numpy()
    np.testing.assert_allclose(theirs, fixtures[f"{name}:out"],
                               rtol=1e-5, atol=1e-6,
                               err_msg=f"{name}: torch mirror drifted "
                                       f"from golden fixture")

    # 2. import the deterministic checkpoint into JAX and compare per tap
    model, variables = import_pth(buf, model=jm, example_input_hw=input_hw)
    t_taps = torch_taps(tm, x_nchw)
    j_taps = _jax_taps(model, variables, encoder_key, x)
    assert len(t_taps) == len(j_taps) == 4
    for i, (tt, jt) in enumerate(zip(t_taps, j_taps)):
        tt_nhwc = tt.transpose(0, 2, 3, 1)
        assert tt_nhwc.shape == jt.shape, f"{name} tap{i} shape"
        np.testing.assert_allclose(
            jt, tt_nhwc, rtol=1e-3, atol=1e-4,
            err_msg=f"{name}: encoder tap {i} diverges")
        # and vs the fixture digest
        d = digest(jt)
        np.testing.assert_allclose(
            d["sample"], fixtures[f"{name}:tap{i}:sample"], rtol=1e-3,
            atol=1e-4, err_msg=f"{name}: tap {i} fixture sample")

    # 3. final output: JAX vs torch and vs fixture
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))[..., 0]
    np.testing.assert_allclose(ours, theirs[:, 0], rtol=1e-3, atol=1e-4,
                               err_msg=f"{name}: final output diverges")
    np.testing.assert_allclose(ours, fixtures[f"{name}:out"][:, 0],
                               rtol=1e-3, atol=1e-4,
                               err_msg=f"{name}: final output vs fixture")
