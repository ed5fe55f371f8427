"""Dry-run of the egress-day ingestion workflow with synthetic stand-ins.

The real artifacts (six released ``.pth`` files, torchvision AlexNet,
lpips heads — reference ``README.md:49-56``) are unreachable offline, so
this builds structurally-faithful stand-ins (same key conventions, same
shapes, random weights) and proves ``ede-ingest`` acquires, converts,
validates, and reports on all of them in one command.
"""

import io
import json
import os

import numpy as np
import pytest
import torch

from efficientdepthestimation_tpu.apps import ingest
from efficientdepthestimation_tpu.apps.common import init_variables
from efficientdepthestimation_tpu.checkpoints.pth_import import (
    state_dict_from_variables,
)
from efficientdepthestimation_tpu.models import build_model

# torchvision AlexNet 'features' conv layers: index -> (out, in, k)
_ALEX_SHAPES = {0: (64, 3, 11), 3: (192, 64, 5), 6: (384, 192, 3),
                8: (256, 384, 3), 10: (256, 256, 3)}


def _standin_checkpoint(path):
    """A random ENB0-HU checkpoint in the reference's exact .pth format."""
    model = build_model("efficientnet-b0", "hu2018")
    variables = init_variables(model, (228, 304))
    sd = state_dict_from_variables(model, variables)
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               path)


def _standin_lpips_inputs(alexnet_path, lpips_path):
    rng = np.random.default_rng(0)
    alex = {}
    chans = []
    for idx, (cout, cin, k) in _ALEX_SHAPES.items():
        alex[f"features.{idx}.weight"] = torch.from_numpy(
            rng.standard_normal((cout, cin, k, k)).astype(np.float32) * 0.05)
        alex[f"features.{idx}.bias"] = torch.from_numpy(
            rng.standard_normal(cout).astype(np.float32) * 0.05)
        chans.append(cout)
    torch.save(alex, alexnet_path)
    heads = {
        f"lin{i}.model.1.weight": torch.from_numpy(
            np.abs(rng.standard_normal((1, c, 1, 1))).astype(np.float32))
        for i, c in enumerate(chans)
    }
    torch.save(heads, lpips_path)


@pytest.mark.slow
def test_ingest_dry_run(tmp_path):
    src = tmp_path / "artifacts"
    out = tmp_path / "released"
    src.mkdir()
    _standin_checkpoint(str(src / "ENB0-HU.pth"))
    _standin_lpips_inputs(str(src / "alexnet-owt-7be5be79.pth"),
                          str(src / "lpips_alex.pth"))
    report_path = tmp_path / "report.json"

    report = ingest.main([
        "--source-dir", str(src), "--out-dir", str(out),
        "--lpips-out", str(tmp_path / "lpips_alex.npz"),
        "--report", str(report_path),
    ])

    # the one provided checkpoint validated and re-exported natively
    entry = report["checkpoints"]["ENB0-HU.pth"]
    assert entry["structural_ok"]
    assert entry["encoder"] == "efficientnet-b0"
    assert entry["decoder"] == "hu2018"
    assert os.path.isfile(entry["native_checkpoint"])
    # the five absent checkpoints are reported as absent, not errors
    assert report["checkpoints"]["RN50-LR.pth"] is None
    # LPIPS converted and self-checked (0 on identical images)
    assert report["lpips"]["structural_ok"]
    assert abs(report["lpips"]["lpips_identity"]) < 1e-5
    # report written and overall ok
    assert json.loads(report_path.read_text())["ok"] is True


def test_ingest_expect_published_requires_csv(tmp_path):
    with pytest.raises(SystemExit):
        ingest.main(["--source-dir", str(tmp_path), "--out-dir",
                     str(tmp_path / "o"), "--expect-published"])


def test_released_table_matches_baseline():
    """The published-number table is the BASELINE.md table, verbatim."""
    assert ingest.RELEASED["RN50-LR.pth"] == (0.849, 0.124)
    assert ingest.RELEASED["ENB0-HU.pth"] == (0.816, 0.140)
    assert len(ingest.RELEASED) == 6
