"""Generate the checked-in golden activation fixtures for the full-size
parity tests (tests/fixtures/golden_full_size.npz).

Run from the repo root:  python tests/make_golden_fixtures.py

Fixtures are produced by the *torch mirrors* (the ground-truth side) with
deterministic seeds: per config, the final depth output (full array) and a
digest (mean/std + 256-value strided sample) of each of the 4 encoder taps.
The day the released checkpoints become importable, per-layer comparison
against real weights follows the same recipe.
"""

import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(__file__))

from full_size_configs import CONFIGS, torch_taps  # noqa: E402

FIXTURE_PATH = os.path.join(os.path.dirname(__file__), "fixtures",
                            "golden_full_size.npz")


def digest(arr: np.ndarray) -> dict[str, np.ndarray]:
    flat = np.asarray(arr, np.float64).ravel()
    stride = max(1, flat.size // 256)
    return {
        "sample": flat[::stride][:256].astype(np.float32),
        "stats": np.asarray([flat.mean(), flat.std()], np.float32),
    }


def main():
    fixtures = {}
    for name, builder in CONFIGS.items():
        print(f"building {name}...", flush=True)
        tm, _, _, input_hw, _ = builder()
        rng = np.random.default_rng(0)
        x = rng.standard_normal((1, *input_hw, 3)).astype(np.float32)
        tm.eval()
        with torch.no_grad():
            out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        fixtures[f"{name}:out"] = out.astype(np.float32)
        for i, tap in enumerate(torch_taps(tm, torch.from_numpy(
                x.transpose(0, 3, 1, 2)))):
            # digest in NHWC (the JAX layout) so test-side digests of JAX
            # taps sample identical element positions
            for key, value in digest(tap.transpose(0, 2, 3, 1)).items():
                fixtures[f"{name}:tap{i}:{key}"] = value
        print(f"  out shape {out.shape}, taps digested")
    os.makedirs(os.path.dirname(FIXTURE_PATH), exist_ok=True)
    np.savez_compressed(FIXTURE_PATH, **fixtures)
    print(f"wrote {FIXTURE_PATH} ({os.path.getsize(FIXTURE_PATH)} bytes)")


if __name__ == "__main__":
    main()
