"""Multi-epoch multi-device training equivalence (VERDICT r3 next-round #2).

The reference claims DataParallel gives the same training at bigger batch
(ReSIDE/train.py:93-101) but never demonstrates it. Here the strongest
offline evidence is produced on the 8-virtual-device CPU mesh: a full
multi-epoch run with ``--zero1`` (Adam moments sharded across the data
axis), preempted mid-run and resumed UNDER the mesh, must reach the same
per-epoch eval metrics as a single-device run at equal effective batch —
GSPMD semantics make the sharded program logically identical to the
single-device one (BN reductions and gradient means are global), so the
only divergence allowed is float reduction order.
"""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("nyu-equiv")
    rng = np.random.default_rng(7)

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

    # 24 train / global batch 8 = 3 steps per epoch
    train_csv = root / "nyu2_train.csv"
    with open(train_csv, "w") as f:
        for i in range(24):
            f.write(",".join(make_pair(i, True)) + "\n")
    test_csv = root / "nyu2_test.csv"
    with open(test_csv, "w") as f:
        for i in range(4):
            f.write(",".join(make_pair(i, False)) + "\n")
    return dict(train_csv=str(train_csv), test_csv=str(test_csv))


def _base_args(synth):
    return [
        "--encoder", "resnet18",
        "--decoder", "hu2018",
        "--epochs", "3",
        "--train-csv", synth["train_csv"],
        "--test-csv", synth["test_csv"],
        "--crop-hw", "64", "96",  # small crop keeps the CPU compile cheap
        "--watch-every", "0",
    ]


def _read_log(ckpt_path):
    with open(os.path.join(os.path.dirname(ckpt_path), "log.jsonl")) as f:
        return [json.loads(line) for line in f if line.strip()]


@pytest.mark.slow
def test_multi_epoch_zero1_mesh_matches_single_device(synth, tmp_path,
                                                      monkeypatch):
    """3 epochs, equal effective batch 8: single-device (1×8) vs 8-device
    mesh (8×1) with ZeRO-1 sharded moments AND a mid-run preemption+resume
    under the mesh. Per-epoch eval metrics must agree to float-reduction
    tolerance."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("WANDB_MODE", "dryrun")

    import jax

    assert len(jax.devices()) >= 8

    from efficientdepthestimation_tpu.apps import train
    from efficientdepthestimation_tpu.parallel import create_mesh

    base = _base_args(synth)

    # A: single-device reference — mesh restricted to 1 device, batch 8
    monkeypatch.setattr(train, "create_mesh", lambda: create_mesh(1))
    ckpt_a = train.main(base + ["--per-device-batch", "8"])
    log_a = _read_log(ckpt_a)
    assert len(log_a) == 3

    # B: full 8-device mesh, per-device batch 1 (same global batch), ZeRO-1;
    # preempted after global step 4 (epoch 1, 1 step in) through the same
    # save-and-exit path SIGTERM takes, then resumed UNDER the mesh.
    monkeypatch.setattr(train, "create_mesh", lambda: create_mesh(8))
    mesh_flags = ["--per-device-batch", "1", "--zero1"]
    rolling = train.main(base + mesh_flags + ["--stop-after-steps", "4"])
    assert rolling.endswith("train_state.ede")
    ckpt_b = train.main(base + mesh_flags + ["--resume", rolling])
    # concatenated trajectory: epoch 0 from the preempted run, 1-2 from resume
    log_b = _read_log(rolling) + _read_log(ckpt_b)
    assert len(log_b) == 3

    # per-epoch equivalence within float-reduction tolerance
    for epoch, (ra, rb) in enumerate(zip(log_a, log_b)):
        for key in ("abs_rel", "delta1", "rmse", "mae", "loss"):
            np.testing.assert_allclose(
                ra[key], rb[key], rtol=2e-3, atol=2e-3,
                err_msg=f"epoch {epoch} metric {key}")

    # the mesh run's best checkpoint loads and its params match the
    # single-device run's to reduction tolerance
    from efficientdepthestimation_tpu.apps.common import load_any_checkpoint

    _, va = load_any_checkpoint(ckpt_a)
    _, vb = load_any_checkpoint(ckpt_b)
    la = jax.tree_util.tree_leaves(va["params"])
    lb = jax.tree_util.tree_leaves(vb["params"])
    assert len(la) == len(lb)
    worst = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                for a, b in zip(la, lb))
    assert worst < 5e-3, f"worst param divergence {worst}"
