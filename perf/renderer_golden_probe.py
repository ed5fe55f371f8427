"""Measure mesh/splat renderer fidelity against the golden rasterizer.

Renders synthetic scenes (real depth discontinuities) over the reference
camera sweep with: (a) the host-side golden triangle rasterizer,
(b) render_novel_views_mesh, (c) render_novel_views (splat). Reports
SSIM/PSNR of (b) and (c) vs (a) per mesh density. Runs on CPU.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax.numpy as jnp

from efficientdepthestimation_tpu.benchmark.metrics import psnr, ssim
from efficientdepthestimation_tpu.benchmark.raster_reference import rasterize_views
from efficientdepthestimation_tpu.benchmark.renderer import (
    reference_camera_animation,
    render_novel_views,
    render_novel_views_mesh,
    render_novel_views_raymarch,
)
from efficientdepthestimation_tpu.data.synthetic_nyu import render_scene

HW = tuple(int(x) for x in os.environ.get("HW", "120,160").split(","))
DENSITIES = [int(d) for d in os.environ.get("DENSITIES", "4,6,8").split(",")]
N_VIEWS = int(os.environ.get("N_VIEWS", "12"))
SCENES = [int(s) for s in os.environ.get("SCENES", "0,3").split(",")]


def camera_sweep(n_views):
    anim = reference_camera_animation(2.5)
    # full 5 s loop sampled uniformly (fps-independent parameterization)
    times = np.linspace(0.0, 5.0, n_views, endpoint=False)
    return np.stack([anim.transform_at(t) for t in times]).astype(np.float32)


def compare(a, b):
    a4 = jnp.asarray(a)
    b4 = jnp.asarray(b)
    return (float(ssim(a4, b4)), float(psnr(jnp.clip(a4, 0, 1), jnp.clip(b4, 0, 1))))


def main():
    views = camera_sweep(N_VIEWS)
    rows = []
    for seed in SCENES:
        rgb_u8, depth_m = render_scene(seed, hw=HW)
        image = rgb_u8.astype(np.float32) / 255.0
        d = depth_m.astype(np.float32)
        depth01 = (d - d.min()) / (d.max() - d.min())
        for density in DENSITIES:
            golden = rasterize_views(image, depth01, views,
                                     mesh_density=density)
            mesh = np.asarray(render_novel_views_mesh(
                jnp.asarray(image), jnp.asarray(depth01), jnp.asarray(views),
                mesh_density=density))
            splat = np.asarray(render_novel_views(
                jnp.asarray(image), jnp.asarray(depth01), jnp.asarray(views)))
            march = np.asarray(render_novel_views_raymarch(
                jnp.asarray(image), jnp.asarray(depth01), jnp.asarray(views),
                mesh_density=density))
            ms, mp = compare(golden, mesh)
            ss, sp = compare(golden, splat)
            rs, rp = compare(golden, march)
            row = {"scene": seed, "density": density,
                   "raymarch_ssim": round(rs, 4), "raymarch_psnr": round(rp, 2),
                   "mesh_ssim": round(ms, 4), "mesh_psnr": round(mp, 2),
                   "splat_ssim": round(ss, 4), "splat_psnr": round(sp, 2)}
            rows.append(row)
            print(row, flush=True)
    out = os.path.join(os.path.dirname(__file__), "renderer_golden.json")
    with open(out, "w") as f:
        json.dump({"hw": HW, "n_views": N_VIEWS, "rows": rows}, f, indent=2)
    print("->", out)


if __name__ == "__main__":
    main()
