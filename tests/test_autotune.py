"""Serving autotuner: candidate enumeration, measurement, policy dispatch."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficientdepthestimation_tpu.apps.autotune import (
    _serving_candidates,
    autotune_serving,
    load_policy,
    policy_key,
)
from efficientdepthestimation_tpu.apps.common import (
    init_variables,
    make_infer_fn,
    make_serving_fn,
)
from efficientdepthestimation_tpu.models import build_model


def test_candidate_enumeration_covers_paths_and_lowerings():
    enb0 = build_model("efficientnet-b0", "hu2018")
    names = [n for n, _ in _serving_candidates(enb0, 256)]
    # 3 lowerings x {monolithic, staged, tiled, tiled-staged}
    # + 4 baked variants (xla lowering only)
    assert len(names) == 16
    assert "monolithic/pallas" in names and "tiled-staged/shift" in names
    assert "monolithic/xla+bake" in names and "tiled/xla+bake" in names

    rn18 = build_model("resnet18", "hu2018")
    names = [n for n, _ in _serving_candidates(rn18, 8)]
    # no EfficientNet lowerings, batch <= tile -> no tiled variants
    assert names == ["monolithic/xla", "staged/xla",
                     "monolithic/xla+bake", "staged/xla+bake"]

    midas = build_model("resnet18", "lasinger2019", input_size=(64, 96),
                        output_size=(32, 48))
    names = [n for n, _ in _serving_candidates(midas, 8)]
    # staged path is Hu-only
    assert names == ["monolithic/xla", "monolithic/xla+bake"]


def test_autotune_measures_caches_and_dispatches(tmp_path):
    model = build_model("resnet18", "hu2018")
    variables = init_variables(model, (64, 96))
    policy_path = str(tmp_path / "policy.json")

    fn, entry = autotune_serving(model, variables, 4, crop_hw=(64, 96),
                                 policy_path=policy_path, warmup=0, iters=1,
                                 verbose=False)
    assert entry["path"] in ("monolithic", "staged")
    assert entry["dw_impl"] == "xla"
    assert entry["fps"] and entry["fps"] > 0
    # every candidate was attempted and recorded
    assert [r["candidate"] for r in entry["measured"]] == [
        "monolithic/xla", "staged/xla",
        "monolithic/xla+bake", "staged/xla+bake"]

    policy = load_policy(policy_path)
    key = policy_key(model, 4, None)
    assert policy[key]["path"] == entry["path"]

    # make_serving_fn dispatches from the cache and stays exact
    images = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 64, 96, 3),
                                                 dtype=np.float32))
    served = np.asarray(make_serving_fn(model, variables, batch_hint=4,
                                        policy_path=policy_path)(images))
    reference = np.asarray(make_infer_fn(model, variables)(images))
    np.testing.assert_allclose(served, reference, atol=1e-5)

    # unmeasured key (different batch) falls back to the built-in heuristic
    fallback = make_serving_fn(model, variables, batch_hint=2,
                               policy_path=policy_path)
    assert np.isfinite(np.asarray(fallback(images[:2]))).all()


def test_load_policy_missing_or_corrupt(tmp_path):
    assert load_policy(str(tmp_path / "nope.json")) == {}
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    assert load_policy(str(bad)) == {}

def test_autotune_int8_candidates_and_accuracy_record(tmp_path):
    """--int8 adds dynamic-int8 variants (xla lowering only), records the
    measured output delta vs the float path, and the cached winner replays
    through make_serving_fn including its int8 flag."""
    model = build_model("resnet18", "hu2018")
    names = [n for n, _ in _serving_candidates(model, 8, int8=True)]
    # int8 composes with baking too (baked weights let XLA constant-fold
    # the weight quantization)
    assert names == ["monolithic/xla", "staged/xla",
                     "monolithic/xla+bake", "staged/xla+bake",
                     "monolithic/xla+int8", "staged/xla+int8",
                     "monolithic/xla+bake+int8", "staged/xla+bake+int8"]

    variables = init_variables(model, (64, 96))
    policy_path = str(tmp_path / "policy.json")
    fn, entry = autotune_serving(model, variables, 4, crop_hw=(64, 96),
                                 policy_path=policy_path, warmup=0, iters=1,
                                 verbose=False, int8=True)
    rows = {r["candidate"]: r for r in entry["measured"]}
    assert set(rows) == set(names)
    for name in ("monolithic/xla+int8", "staged/xla+int8",
                 "monolithic/xla+bake+int8"):
        err = rows[name]["rel_out_err"]
        # rn18-hu at 64x96 has eligible 128-aligned decoder convs, so int8
        # must actually perturb the output - but only at the ~1% scale
        assert 0 < err < 0.05
    assert "int8" in entry and "bake_weights" in entry

    # a forced-int8 policy entry replays through make_serving_fn
    policy = load_policy(policy_path)
    key = policy_key(model, 4, None)
    policy[key] = {"path": "monolithic", "dw_impl": "xla", "int8": True,
                   "fps": 1.0}
    (tmp_path / "policy.json").write_text(json.dumps(policy))
    images = jnp.asarray(
        np.random.default_rng(1).standard_normal((4, 64, 96, 3),
                                                 dtype=np.float32))
    served = np.asarray(make_serving_fn(model, variables, batch_hint=4,
                                        policy_path=policy_path)(images))
    reference = np.asarray(make_infer_fn(model, variables)(images))
    rel = (np.linalg.norm(served - reference)
           / max(np.linalg.norm(reference), 1e-30))
    assert 0 < rel < 0.05  # int8 path ran (differs), within band


# ------------------------------------------------------------- training

def test_train_candidate_grid():
    from efficientdepthestimation_tpu.apps.autotune import _train_candidates

    cands = _train_candidates(8)
    # accum 1 gets all three remat modes; accum>1 only no-remat
    assert {"accum_steps": 1, "remat": None} in cands
    assert {"accum_steps": 1, "remat": "dots"} in cands
    assert {"accum_steps": 1, "remat": "full"} in cands
    assert {"accum_steps": 4, "remat": None} in cands
    assert {"accum_steps": 4, "remat": "full"} not in cands
    # accum must divide the batch
    assert all(8 % c["accum_steps"] == 0 for c in cands)
    assert {"accum_steps": 8, "remat": None} in cands
    cands6 = _train_candidates(6)
    assert all(c["accum_steps"] in (1, 2) for c in cands6)


@pytest.mark.slow
def test_autotune_train_measures_and_caches(tmp_path):
    from efficientdepthestimation_tpu.apps.autotune import (
        autotune_train,
        load_policy,
        train_policy_key,
    )

    policy_path = str(tmp_path / "train_policy.json")
    entry = autotune_train("resnet18", "hu2018", 2, crop_hw=(64, 96),
                           bf16=False, policy_path=policy_path,
                           warmup=0, iters=2, verbose=False)
    assert entry["img_per_s"] > 0
    assert entry["accum_steps"] in (1, 2)
    measured = [r for r in entry["measured"] if r["img_per_s"]]
    assert len(measured) >= 2  # at least accum1/no-remat and accum2

    policy = load_policy(policy_path)
    key = train_policy_key("resnet18", "hu2018", 2, None)
    assert policy[key]["accum_steps"] == entry["accum_steps"]


def test_apply_train_policy_resolution(tmp_path):
    from efficientdepthestimation_tpu.apps.autotune import (
        apply_train_policy,
        train_policy_key,
    )

    path = str(tmp_path / "p.json")
    key = train_policy_key("resnet50", "hu2018", 128, jnp.bfloat16)
    with open(path, "w") as f:
        json.dump({key: {"accum_steps": 2, "remat": None,
                         "img_per_s": 100.0}}, f)

    # unset flags adopt the measured policy
    accum, remat, src = apply_train_policy(path, "resnet50", "hu2018", 128,
                                           jnp.bfloat16, None, "auto")
    assert (accum, remat, src) == (2, None, "policy")
    # explicit flags always win
    accum, remat, src = apply_train_policy(path, "resnet50", "hu2018", 128,
                                           jnp.bfloat16, 4, "full")
    assert (accum, remat, src) == (4, "full", "flags")
    # 'none' is an explicit no-remat; the policy pair was measured JOINTLY
    # (the grid never pairs accum>1 with remat), so one explicit flag
    # bypasses the whole entry rather than splicing an unmeasured combo
    accum, remat, src = apply_train_policy(path, "resnet50", "hu2018", 128,
                                           jnp.bfloat16, None, "none")
    assert (accum, remat, src) == (1, None, "flags")
    # ...and an explicit accum alone likewise ignores the policy remat
    accum, remat, src = apply_train_policy(path, "resnet50", "hu2018", 128,
                                           jnp.bfloat16, 1, "auto")
    assert (accum, remat, src) == (1, None, "flags")
    # unmeasured key falls back to defaults
    accum, remat, src = apply_train_policy(path, "resnet18", "hu2018", 8,
                                           None, None, "auto")
    assert (accum, remat, src) == (1, None, "defaults")
    # no policy file at all
    accum, remat, src = apply_train_policy(None, "resnet18", "hu2018", 8,
                                           None, None, "auto")
    assert (accum, remat, src) == (1, None, "defaults")
