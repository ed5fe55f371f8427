"""Fresh render-sweep timing with the native encoders (VERDICT r4 next #4).

The round-4 E2E spent ~85% of wall time in the benchmark phase's host
encoding — fresh 25-sample sweeps cost ~770 s each with device-render /
host-encode overlap, bounded by single-core cv2-DIVX + PIL-PNG encoding
(e2e/E2E.md:179, e2e/timings.json). Round 5 adds C++ encoders (libjpeg
MJPEG-AVI + libpng level-1 stills, native/csrc/encode.cpp); this probe
times the SAME ``create_rendered_images`` sweep (25 samples, 320×240,
60 fps, mesh engine — the r4 E2E configuration; e2e/render_*.png confirm
the 320×240 render resolution) twice on the same machine:

  * native:   the new default (MJPEG-AVI + native PNG stills)
  * fallback: the r4 path (cv2 DIVX + PIL PNG), forced by disabling the
    native encoder

and writes perf/render_sweep_r5.json with both wall times + the speedup.
Run on the chip: ``python perf/render_sweep_r5.py`` (SAMPLES=25 default;
device renders overlap host encode in both arms, as in r4).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from efficientdepthestimation_tpu.utils.jitcache import enable_persistent_cache

enable_persistent_cache()

SAMPLES = int(os.environ.get("SAMPLES", "25"))


def make_loader(n, seed=0):
    """n synthetic 240×320 room-like samples (image [0,1] + depth metres) —
    the r4 E2E's render resolution (e2e/render_*.png are 320×240), so the
    A/B is apples-to-apples with the committed 770 s sweeps."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:240, 0:320]
    samples = []
    for i in range(n):
        base = (np.sin(xx / (30 + i)) + np.cos(yy / (25 + i))) * 0.25 + 0.5
        image = np.stack([base, base * 0.9, base * 0.8], -1)
        image += rng.random((240, 320, 3)) * 0.05
        depth = 2.0 + 2.0 * base + 0.3 * rng.random((240, 320))
        samples.append({"image": np.clip(image, 0, 1).astype(np.float32),
                        "depth": depth.astype(np.float32)})
    return samples


def run_sweep(samples, out_dir):
    from efficientdepthestimation_tpu.benchmark.renderer import (
        create_rendered_images,
    )

    elapsed = create_rendered_images(out_dir, samples, fps=60,
                                     mesh_density=8, displacement_factor=4.0,
                                     method="mesh")
    return elapsed.total_seconds()


def main():
    import jax

    from efficientdepthestimation_tpu.native import encoder

    print("platform:", jax.default_backend(), jax.devices(), flush=True)
    assert encoder.is_available(), "native encoder failed to build"
    samples = make_loader(SAMPLES)
    work = tempfile.mkdtemp(prefix="render_r5_")

    results = {"samples": SAMPLES, "resolution": "320x240", "fps": 60,
               "engine": "mesh", "host_cores": os.cpu_count()}

    # arm 1: native encoders (new default). Run first so its timing includes
    # any first-compile cost the fallback arm would otherwise skip; the
    # cache makes the renders themselves identical work in both arms.
    native_dir = os.path.join(work, "native")
    results["native_s"] = round(run_sweep(samples, native_dir), 1)
    print(f"native sweep: {results['native_s']}s", flush=True)

    # arm 2: force the r4 cv2-DIVX/PIL fallback
    import efficientdepthestimation_tpu.native.encoder as enc_mod

    orig = enc_mod.is_available
    enc_mod.is_available = lambda: False
    try:
        fb_dir = os.path.join(work, "fallback")
        results["fallback_s"] = round(run_sweep(samples, fb_dir), 1)
    finally:
        enc_mod.is_available = orig
    print(f"fallback sweep: {results['fallback_s']}s", flush=True)

    results["speedup"] = round(results["fallback_s"] / results["native_s"], 2)
    results["r4_committed_fresh_sweep_s"] = 770.0
    results["vs_r4_committed"] = round(770.0 / results["native_s"], 2)

    # sanity: both arms produced the same artifact counts
    for arm in ("native", "fallback"):
        d = os.path.join(work, arm)
        results[f"{arm}_videos"] = len(os.listdir(os.path.join(d, "video")))
    shutil.rmtree(work, ignore_errors=True)

    path = os.path.join(os.path.dirname(__file__), "render_sweep_r5.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
