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


def _make_dataset_zip(zip_path, n_train=6, n_test=3):
    """A synthetic tarball in the reference nyu_data.zip layout: repo-root-
    relative csv rows (data/nyu2_train/...), 8-bit train / 16-bit test
    depths (loaddata.py:44,73; nyu_transform.py:170-175)."""
    import zipfile

    from PIL import Image

    rng = np.random.default_rng(3)

    def png_bytes(arr, mode=None):
        buf = io.BytesIO()
        Image.fromarray(arr, mode=mode).save(buf, format="PNG")
        return buf.getvalue()

    with zipfile.ZipFile(zip_path, "w") as zf:
        train_rows, test_rows = [], []
        for i in range(n_train):
            img = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
            dep = rng.integers(10, 250, (480, 640), dtype=np.uint8)
            ipath = f"data/nyu2_train/scene_{i}/1.jpg"
            dpath = f"data/nyu2_train/scene_{i}/1.png"
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="JPEG")
            zf.writestr(ipath, buf.getvalue())
            zf.writestr(dpath, png_bytes(dep))
            train_rows.append(f"{ipath},{dpath}")
        for i in range(n_test):
            img = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
            dep = rng.integers(500, 9000, (480, 640)).astype(np.uint16)
            ipath = f"data/nyu2_test/{i:05d}_colors.png"
            dpath = f"data/nyu2_test/{i:05d}_depth.png"
            zf.writestr(ipath, png_bytes(img))
            zf.writestr(dpath, png_bytes(dep, mode="I;16"))
            test_rows.append(f"{ipath},{dpath}")
        zf.writestr("data/nyu2_train.csv", "\n".join(train_rows) + "\n")
        zf.writestr("data/nyu2_test.csv", "\n".join(test_rows) + "\n")


def test_ingest_dataset_dry_run(tmp_path):
    """`ede-ingest --dataset-only` converts a reference-layout archive into
    ready-to-train csvs that DepthPairDataset loads directly (VERDICT r3
    next-round #6: egress day is one command for data too)."""
    from efficientdepthestimation_tpu.data import DepthPairDataset

    src = tmp_path / "artifacts"
    src.mkdir()
    _make_dataset_zip(str(src / "nyu_data.zip"))

    data_out = tmp_path / "data"
    report_path = tmp_path / "report.json"
    report = ingest.main([
        "--dataset-only", "--source-dir", str(src),
        "--data-out", str(data_out), "--report", str(report_path),
    ])
    entry = report["dataset"]
    assert entry["structural_ok"] is True
    assert entry["train"]["rows"] == 6 and entry["test"]["rows"] == 3
    assert entry["train"]["bit_depth_ok"] and entry["test"]["bit_depth_ok"]
    assert entry["train"]["dropped"] == 0

    # the normalized csvs feed the train loader directly, both conventions
    train_ds = DepthPairDataset(str(data_out / "nyu2_train.csv"),
                                is_test=False, use_native=False)
    img, dep = train_ds[0]
    assert img.shape == (480, 640, 3) and dep.dtype == np.uint8
    test_ds = DepthPairDataset(str(data_out / "nyu2_test.csv"),
                               is_test=True, use_native=False)
    img, dep = test_ds[0]
    assert dep.dtype in (np.uint16, np.int32)
    assert json.loads(report_path.read_text())["ok"] is True


def test_ingest_dataset_extracted_tree(tmp_path):
    """An already-extracted tree (no archive) is accepted as the source."""
    import zipfile

    src = tmp_path / "artifacts"
    src.mkdir()
    _make_dataset_zip(str(src / "nyu_data.zip"), n_train=2, n_test=2)
    tree = tmp_path / "tree"
    with zipfile.ZipFile(str(src / "nyu_data.zip")) as zf:
        zf.extractall(str(tree))
    os.remove(str(src / "nyu_data.zip"))

    report = ingest.main([
        "--dataset-only", "--source-dir", str(tree),
        "--data-out", str(tmp_path / "data2"),
        "--report", str(tmp_path / "r2.json"),
    ])
    assert report["dataset"]["structural_ok"] is True
    assert report["dataset"]["train"]["rows"] == 2


def test_archive_magic_and_selection(tmp_path):
    """ADVICE r4 hardening: bad downloads are rejected by magic check before
    extraction, unrelated archives are never blind-extracted, and tar
    extraction refuses traversal members (filter='data')."""
    import tarfile

    # 1. an HTML interstitial saved as nyu_data.zip fails the magic check
    html = tmp_path / "nyu_data.zip"
    html.write_text("<html>Google Drive - Virus scan warning</html>")
    assert ingest._archive_kind(str(html)) is None
    with pytest.raises(RuntimeError, match="magic check failed"):
        ingest._extract_archive(str(html), str(tmp_path / "out"))

    # 2. real magic detection: zip and tar
    _make_dataset_zip(str(tmp_path / "real_nyu.zip"), n_train=1, n_test=1)
    assert ingest._archive_kind(str(tmp_path / "real_nyu.zip")) == "zip"
    tar_path = tmp_path / "bundle.tar"
    with tarfile.open(tar_path, "w") as tf:
        p = tmp_path / "ckpt.bin"
        p.write_bytes(b"\x00" * 64)
        tf.add(str(p), arcname="checkpoints/ckpt.bin")
    assert ingest._archive_kind(str(tar_path)) == "tar"

    # 3. selection prefers the nyu-named/-listing archive over the
    # alphabetically-first unrelated bundle ('bundle.tar' < 'real_nyu.zip')
    html.unlink()
    src = ingest._find_dataset_source(str(tmp_path), str(tmp_path / "d"),
                                      download=False)
    assert src is not None and os.path.basename(src) == "real_nyu.zip"

    # 4. an unrelated-named archive whose listing DOES hold the csv is found
    os.rename(str(tmp_path / "real_nyu.zip"), str(tmp_path / "zz_data.zip"))
    src = ingest._find_dataset_source(str(tmp_path), str(tmp_path / "d"),
                                      download=False)
    assert src is not None and os.path.basename(src) == "zz_data.zip"

    # 5. tar-slip members are refused, not written outside dest
    evil = tmp_path / "evil_nyu.tar"
    with tarfile.open(evil, "w") as tf:
        p = tmp_path / "payload"
        p.write_bytes(b"x")
        tf.add(str(p), arcname="../escaped")
    with pytest.raises(tarfile.FilterError):
        ingest._extract_archive(str(evil), str(tmp_path / "jail" / "inner"))
    assert not (tmp_path / "jail" / "escaped").exists()
