"""Preemption-safe training: SIGTERM checkpoint + exact mid-epoch resume.

The reference has no failure handling — a killed run restarts from the last
per-epoch best checkpoint via --start-epoch (SURVEY §5 "failure detection:
none", ReSIDE/train.py:60-61). The TPU build treats preemption as a
first-class event (pods surface maintenance as SIGTERM): the train loop
checkpoints the FULL train state at the next step boundary and exits
cleanly, and --resume replays the rest of the epoch bit-identically
(deterministic per-epoch shuffle + step-keyed rng).
"""

import os
import signal

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("nyu-preempt")
    rng = np.random.default_rng(1)

    def make_pair(i, train):
        img = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
        img_path = str(root / f"{'tr' if train else 'te'}_{i}_rgb.png")
        Image.fromarray(img).save(img_path)
        if train:
            depth = rng.integers(10, 250, (480, 640), dtype=np.uint8)
            d_path = str(root / f"tr_{i}_d.png")
            Image.fromarray(depth).save(d_path)
        else:
            depth = rng.integers(500, 9000, (480, 640)).astype(np.uint16)
            d_path = str(root / f"te_{i}_d.png")
            Image.fromarray(depth, mode="I;16").save(d_path)
        return img_path, d_path

    # 24 train samples / global batch 8 (8 virtual devices x 1) = 3 steps/epoch
    train_csv = root / "nyu2_train.csv"
    with open(train_csv, "w") as f:
        for i in range(24):
            f.write(",".join(make_pair(i, True)) + "\n")
    test_csv = root / "nyu2_test.csv"
    with open(test_csv, "w") as f:
        for i in range(2):
            f.write(",".join(make_pair(i, False)) + "\n")
    return dict(train_csv=str(train_csv), test_csv=str(test_csv))


def test_sigterm_sets_preemption_flag():
    from efficientdepthestimation_tpu.apps import train

    train._install_preemption_handler()
    try:
        assert not train._PREEMPTED.is_set()
        os.kill(os.getpid(), signal.SIGTERM)
        assert train._PREEMPTED.wait(5), "handler did not set the flag"
    finally:
        train._PREEMPTED.clear()
        signal.signal(signal.SIGTERM, signal.SIG_DFL)


def _base_args(synth):
    return [
        "--encoder", "resnet18",
        "--decoder", "hu2018",
        "--epochs", "2",
        "--train-csv", synth["train_csv"],
        "--test-csv", synth["test_csv"],
        "--per-device-batch", "1",
        "--crop-hw", "64", "96",  # small crop keeps the CPU compile cheap
        "--watch-every", "0",
    ]


def _flat(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_flat(v, key))
        else:
            out[key] = np.asarray(v)
    return out


@pytest.mark.slow
def test_mid_epoch_preemption_resume_is_exact(synth, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("WANDB_MODE", "dryrun")

    from efficientdepthestimation_tpu.apps import train
    from efficientdepthestimation_tpu.checkpoints.serialization import _read

    base = _base_args(synth)

    # A: uninterrupted 2-epoch reference run (6 global steps)
    ckpt_a = train.main(base)
    state_a = os.path.join(os.path.dirname(ckpt_a), "train_state.ede")

    # B: "preempted" after global step 4 = epoch 1, 1 step in. The
    # --stop-after-steps hook exercises the identical save-and-exit path the
    # SIGTERM handler triggers; --save-every additionally exercises the
    # periodic within-epoch save.
    rolling_b = train.main(base + ["--stop-after-steps", "4",
                                   "--save-every", "2"])
    hdr_b, _ = _read(rolling_b)
    assert hdr_b["step"] == 4
    assert hdr_b["epoch"] == 1
    assert hdr_b["step_in_epoch"] == 1

    # C: resume replays the remaining 2 steps of epoch 1
    ckpt_c = train.main(base + ["--resume", rolling_b])
    state_c = os.path.join(os.path.dirname(ckpt_c), "train_state.ede")

    ha, pa = _read(state_a)
    hc, pc = _read(state_c)
    assert ha["step"] == hc["step"] == 6
    assert "step_in_epoch" not in ha and "step_in_epoch" not in hc
    fa, fc = _flat(pa), _flat(pc)
    assert fa.keys() == fc.keys()
    for key in fa:
        np.testing.assert_array_equal(fa[key], fc[key], err_msg=key)
    # the post-resume best checkpoint is a loadable model file too
    from efficientdepthestimation_tpu.apps.common import load_any_checkpoint

    _, variables = load_any_checkpoint(ckpt_c)
    assert "params" in variables
