"""Synthetic-NYU generator: conventions, determinism, structure."""

import numpy as np
import pytest

from efficientdepthestimation_tpu.data import DepthPairDataset
from efficientdepthestimation_tpu.data.synthetic_nyu import (
    generate_dataset,
    render_scene,
)


@pytest.mark.smoke
def test_scene_is_deterministic_and_structured():
    rgb, depth = render_scene(7, hw=(120, 160))
    rgb2, depth2 = render_scene(7, hw=(120, 160))
    assert np.array_equal(rgb, rgb2) and np.array_equal(depth, depth2)
    assert rgb.shape == (120, 160, 3) and rgb.dtype == np.uint8
    assert depth.shape == (120, 160) and depth.dtype == np.float32
    # NYU-like metric range
    assert 0.5 < depth.min() and depth.max() < 10.0
    # real discontinuities: occlusion edges produce large jumps
    assert np.abs(np.diff(depth, axis=1)).max() > 0.5
    # RGB correlates with depth (the shading cue a net can learn):
    lum = rgb.mean(axis=-1).astype(np.float32).ravel()
    corr = np.corrcoef(lum, depth.ravel())[0, 1]
    assert corr < -0.1, corr  # farther → darker

    different = render_scene(8, hw=(120, 160))[1]
    assert not np.array_equal(depth, different)


def test_generated_dataset_round_trips_conventions(tmp_path):
    train_csv, test_csv = generate_dataset(str(tmp_path), 3, 2, hw=(60, 80))
    # train: 8-bit ×25.5/m; test: 16-bit mm (nyu_transform.py:170-175)
    train = DepthPairDataset(train_csv, is_test=False)
    img, dep = (np.asarray(a) for a in train[0])
    assert img.dtype == np.uint8 and dep.dtype == np.uint8
    test = DepthPairDataset(test_csv, is_test=True)
    img_t, dep_t = (np.asarray(a) for a in test[0])
    assert dep_t.dtype == np.uint16
    # encoded values decode to the same metric depth (up to quantisation)
    _, depth_m = render_scene(10_000_000, hw=(60, 80))  # first test scene
    assert np.allclose(dep_t / 1000.0, depth_m, atol=1e-3)
    assert len(train) == 3 and len(test) == 2
