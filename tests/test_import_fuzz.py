"""Adversarial .pth import fuzzing (round-3 hardening).

``import_pth`` must either load a checkpoint correctly or fail loudly —
never silently misload. Each case below mutates a valid state dict the way
real-world reference checkpoints do (DataParallel re-wraps, mixed SENet key
vintages, stray buffers, truncation) and asserts the contract.

Reference conventions being defended: ``module.`` strip
(``inference_benchmark.py:141-147``), ``se_ → se_module.`` rewrite
(``reside_model.py:42-43``), strict full consumption of full-model
checkpoints.
"""

import io

import numpy as np
import pytest
import torch

from efficientdepthestimation_tpu.apps.common import init_variables
from efficientdepthestimation_tpu.checkpoints.pth_import import (
    import_pth,
    state_dict_from_variables,
    variables_from_state_dict,
)
from efficientdepthestimation_tpu.models import build_model


@pytest.fixture(scope="module")
def rn18_hu():
    model = build_model("resnet18", "hu2018")
    variables = init_variables(model, (64, 96))
    sd = state_dict_from_variables(model, variables)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    return model, variables, sd


def _save(sd, path):
    torch.save(sd, path)
    return str(path)


def _forward(model, variables):
    import jax.numpy as jnp

    x = jnp.asarray(np.random.default_rng(0).random((1, 64, 96, 3), np.float32))
    return np.asarray(model.apply(variables, x))


def test_double_module_prefix_loads_clean(rn18_hu, tmp_path):
    model, variables, sd = rn18_hu
    mangled = {f"module.module.{k}": v for k, v in sd.items()}
    path = _save(mangled, tmp_path / "RN18-HU.pth")
    _, loaded = import_pth(path, model=model, example_input_hw=(64, 96))
    np.testing.assert_allclose(_forward(model, loaded),
                               _forward(model, variables), rtol=1e-5, atol=1e-5)


def test_mixed_module_prefix_loads_clean(rn18_hu, tmp_path):
    # half the keys wrapped, half not — seen when checkpoints are merged
    model, variables, sd = rn18_hu
    keys = sorted(sd)
    mangled = {(f"module.{k}" if i % 2 else k): sd[k]
               for i, k in enumerate(keys)}
    path = _save(mangled, tmp_path / "RN18-HU.pth")
    _, loaded = import_pth(path, model=model, example_input_hw=(64, 96))
    np.testing.assert_allclose(_forward(model, loaded),
                               _forward(model, variables), rtol=1e-5, atol=1e-5)


def test_extra_keys_raise_not_silently_ignored(rn18_hu, tmp_path):
    model, _, sd = rn18_hu
    poisoned = dict(sd)
    poisoned["E.stowaway.weight"] = torch.zeros(3, 3)
    path = _save(poisoned, tmp_path / "RN18-HU.pth")
    with pytest.raises(KeyError, match="Unused torch keys.*stowaway"):
        import_pth(path, model=model, example_input_hw=(64, 96))


def test_num_batches_tracked_is_expected_and_ignored(rn18_hu, tmp_path):
    # real torch checkpoints carry BN bookkeeping buffers — not an error
    model, variables, sd = rn18_hu
    with_buffers = dict(sd)
    bn_key = next(k for k in sd if k.endswith("running_mean"))
    with_buffers[bn_key.replace("running_mean", "num_batches_tracked")] = (
        torch.tensor(42))
    path = _save(with_buffers, tmp_path / "RN18-HU.pth")
    _, loaded = import_pth(path, model=model, example_input_hw=(64, 96))
    np.testing.assert_allclose(_forward(model, loaded),
                               _forward(model, variables), rtol=1e-5, atol=1e-5)


def test_missing_key_raises_with_expected_name(rn18_hu, tmp_path):
    model, _, sd = rn18_hu
    truncated = dict(sd)
    victim = next(k for k in sorted(truncated) if k.startswith("R."))
    del truncated[victim]
    path = _save(truncated, tmp_path / "RN18-HU.pth")
    with pytest.raises(KeyError, match=victim.replace(".", r"\.")):
        import_pth(path, model=model, example_input_hw=(64, 96))


def test_shape_mismatch_raises_value_error(rn18_hu, tmp_path):
    model, _, sd = rn18_hu
    wrong = dict(sd)
    key = next(k for k in sorted(wrong)
               if k.endswith(".weight") and wrong[k].ndim == 4)
    wrong[key] = torch.zeros(1, 2, 3, 4)
    path = _save(wrong, tmp_path / "RN18-HU.pth")
    with pytest.raises(ValueError, match="Shape mismatch"):
        import_pth(path, model=model, example_input_hw=(64, 96))


def test_corrupt_file_raises_cleanly(tmp_path):
    path = tmp_path / "RN18-HU.pth"
    path.write_bytes(b"\x00\x01garbage" * 100)
    with pytest.raises(Exception) as err:
        import_pth(str(path), model=build_model("resnet18", "hu2018"),
                   example_input_hw=(64, 96))
    assert not isinstance(err.value, (SystemExit, MemoryError))


def test_mixed_senet_key_vintages_load_identically(tmp_path):
    """Old ('se_fc1') and new ('se_module.fc1') key styles, even mixed
    per-layer, must produce the same weights (reside_model.py:42-43)."""
    model = build_model("senet154", "hu2018")
    variables = init_variables(model, (64, 96))
    sd = state_dict_from_variables(model, variables)
    canonical = {k: torch.from_numpy(np.ascontiguousarray(v))
                 for k, v in sd.items()}
    # the exporter writes new-style 'se_module.' keys
    assert any("se_module.fc1" in k for k in canonical), (
        "exporter key convention changed; update this test")
    # released checkpoints store old-style 'se_' keys (reside_model.py:42-43)
    old = {k.replace("se_module.", "se_"): v for k, v in canonical.items()}
    # worst case: a checkpoint with BOTH vintages mixed per-layer
    mixed = {}
    for i, (k, v) in enumerate(sorted(canonical.items())):
        if "se_module." in k and i % 2 == 0:
            k = k.replace("se_module.", "se_")
        mixed[k] = v
    template = _template(model)
    results = [
        variables_from_state_dict(model, template, _fix(s, senet=True))
        for s in (canonical, old, mixed)
    ]
    base = [np.asarray(x) for x in _leaves(results[0])]
    for other in results[1:]:
        got = [np.asarray(x) for x in _leaves(other)]
        assert all(np.array_equal(x, y) for x, y in zip(base, got))


def _template(model):
    import jax
    import jax.numpy as jnp

    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x))
    return jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), shapes)


def _fix(sd, senet):
    from efficientdepthestimation_tpu.checkpoints.pth_import import _fix_keys

    return _fix_keys({k: v.numpy() for k, v in sd.items()}, senet=senet)


def _leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)
