"""AOT serving artifacts (checkpoints/export.py): round-trip fidelity.

The exported StableHLO module must reproduce the live pipeline exactly —
baked or arg-weights, static or symbolic batch — because the artifact is
the only thing the serving site has (no model code there).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from efficientdepthestimation_tpu.checkpoints.export import (
    _pipeline,
    load_serving_artifact,
    save_serving_artifact,
)

IN_HW = (60, 80)
CROP_HW = (24, 32)
OUT_HW = (60, 80)


class _TinyDepth(nn.Module):
    """Minimal stand-in with the model.apply(variables, images) contract."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(8, (3, 3), padding="SAME")(x)
        x = nn.relu(x)
        return nn.Conv(1, (3, 3), padding="SAME")(x)


def _tiny(seed=0):
    model = _TinyDepth()
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1, *CROP_HW, 3)))
    return model, variables


def _frames(rng, batch):
    return jnp.asarray(rng.integers(0, 256, (batch, *IN_HW, 3), dtype=np.uint8))


def _reference_out(model, variables, frames, dtype=jnp.bfloat16):
    if dtype is not None:
        variables = jax.tree_util.tree_map(
            lambda v: v.astype(dtype)
            if hasattr(v, "astype") and v.dtype == jnp.float32 else v,
            variables)
    return np.asarray(_pipeline(model, CROP_HW, OUT_HW, dtype)(variables, frames))


def test_baked_artifact_roundtrip(tmp_path, rng):
    model, variables = _tiny()
    path = tmp_path / "tiny.edz"
    meta = save_serving_artifact(
        path, model, variables, encoder="tiny", decoder="tiny",
        batch=3, in_hw=IN_HW, crop_hw=CROP_HW, out_hw=OUT_HW)
    assert meta["baked_weights"] and meta["batch"] == 3
    assert meta["platforms"] == ["cpu"]

    fn, meta2 = load_serving_artifact(path)
    assert meta2 == meta
    frames = _frames(rng, 3)
    got = np.asarray(fn(frames))
    assert got.shape == (3, *OUT_HW, 1)
    # baked constants let XLA fold/reassociate at bf16 precision (the same
    # documented delta as make_infer_fn(bake_weights=True) vs the arg path)
    np.testing.assert_allclose(got, _reference_out(model, variables, frames),
                               rtol=0, atol=1e-2)


def test_arg_weights_artifact_carries_its_own_tree(tmp_path, rng):
    """The no-bake artifact must serve the weights it was saved with, even
    when different same-architecture weights exist at the serving site."""
    model, w1 = _tiny(seed=0)
    _, w2 = _tiny(seed=1)
    path = tmp_path / "tiny_argw.edz"
    meta = save_serving_artifact(
        path, model, w1, encoder="tiny", decoder="tiny",
        batch=2, in_hw=IN_HW, crop_hw=CROP_HW, out_hw=OUT_HW,
        bake_weights=False)
    assert not meta["baked_weights"]

    fn, _ = load_serving_artifact(path)
    frames = _frames(rng, 2)
    got = np.asarray(fn(frames))
    want_w1 = _reference_out(model, w1, frames)
    want_w2 = _reference_out(model, w2, frames)
    np.testing.assert_allclose(got, want_w1, rtol=0, atol=1e-6)
    assert np.max(np.abs(want_w1 - want_w2)) > 1e-4  # the check is meaningful


def test_dynamic_batch_artifact_serves_any_batch(tmp_path, rng):
    model, variables = _tiny()
    path = tmp_path / "tiny_dyn.edz"
    meta = save_serving_artifact(
        path, model, variables, encoder="tiny", decoder="tiny",
        batch=None, in_hw=IN_HW, crop_hw=CROP_HW, out_hw=OUT_HW)
    assert meta["batch"] is None

    fn, _ = load_serving_artifact(path)
    for b in (1, 4):
        frames = _frames(rng, b)
        got = np.asarray(fn(frames))
        assert got.shape == (b, *OUT_HW, 1)
        np.testing.assert_allclose(
            got, _reference_out(model, variables, frames), rtol=0, atol=1e-2)


def test_f32_export_is_exact(tmp_path, rng):
    model, variables = _tiny()
    path = tmp_path / "tiny_f32.edz"
    save_serving_artifact(
        path, model, variables, encoder="tiny", decoder="tiny",
        batch=2, in_hw=IN_HW, crop_hw=CROP_HW, out_hw=OUT_HW, dtype=None)
    fn, meta = load_serving_artifact(path)
    assert meta["dtype"] is None
    frames = _frames(rng, 2)
    np.testing.assert_array_equal(
        np.asarray(fn(frames)),
        _reference_out(model, variables, frames, dtype=None))


def test_rejects_non_artifact(tmp_path):
    import zipfile

    bad = tmp_path / "bad.edz"
    with zipfile.ZipFile(bad, "w") as zf:
        zf.writestr("meta.json", "{}")
    with pytest.raises(ValueError, match="Not a serving artifact"):
        load_serving_artifact(bad)


@pytest.mark.slow
def test_export_cli_real_model(tmp_path):
    """End-to-end through the CLI on the flagship architecture (random init)."""
    from efficientdepthestimation_tpu.apps import export as export_app

    out = tmp_path / "enb0.edz"
    meta = export_app.main([
        "--encoder", "efficientnet-b0", "--decoder", "hu2018",
        "--out", str(out), "--batch", "2",
        "--in-hw", "480", "640", "--crop-hw", "228", "304",
        "--out-hw", "480", "640", "--verify",
    ])
    assert meta["encoder"] == "efficientnet-b0"
    assert out.exists()
