"""Frames → per-frame point clouds (.ply) — equivalent of ReSIDE/point_clouds.py.

Per frame: demo preprocess (Scale 320×240 → CenterCrop 304×228 → normalize) →
model → align-corners upsample to input size → unproject with the halved NYU
Kinect intrinsics (point_clouds.py:105-108) → optional Z-mirror → write
``{i:04d}.ply``, at most 61 frames (point_clouds.py:146-147).
"""

from __future__ import annotations

import argparse
import os
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from efficientdepthestimation_tpu.apps.common import load_any_checkpoint, make_infer_fn
from efficientdepthestimation_tpu.data import demo_preprocess
from efficientdepthestimation_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
from efficientdepthestimation_tpu.utils.pointcloud import (
    NYU_V2_INTRINSICS_HALF,
    unproject_depth,
    write_ply,
)


def main(args: Optional[List[str]] = None):
    from efficientdepthestimation_tpu.utils.jitcache import enable_persistent_cache

    enable_persistent_cache()
    parser = argparse.ArgumentParser(description="Depth → point clouds")
    parser.add_argument("-i", "--images-path", required=True, type=str)
    parser.add_argument("-m", "--model-path", required=True, type=str)
    parser.add_argument("-o", "--output-path", required=True, type=str)
    parser.add_argument("--mirror-z-axis", action="store_true")
    parser.add_argument("--max-frames", default=61, type=int)
    args = parser.parse_args(args)

    from PIL import Image

    model, variables = load_any_checkpoint(args.model_path)
    os.makedirs(args.output_path, exist_ok=True)
    infer = make_infer_fn(model, variables, upsample_to=(228, 304))

    for i, name in enumerate(sorted(os.listdir(args.images_path))):
        with Image.open(os.path.join(args.images_path, name)) as img:
            rgb = np.asarray(img.convert("RGB"))
        images = demo_preprocess(jnp.asarray(rgb[None]))
        depth = np.asarray(infer(images))[0, :, :, 0]

        # denormalise for the colour channel (point_clouds.py:97-102)
        color = np.asarray(images)[0] * IMAGENET_STD + IMAGENET_MEAN
        color = np.clip(color, 0.0, 1.0)

        points, colors = unproject_depth(
            depth, color, mirror_z=args.mirror_z_axis, **{
                k: NYU_V2_INTRINSICS_HALF[k] for k in ("fx", "fy", "cx", "cy")})
        out = os.path.join(args.output_path, f"{i:04d}.ply")
        write_ply(out, points, colors)
        print(f"Wrote frame {i + 1:d} to {out}")
        if i >= args.max_frames - 1:
            break


if __name__ == "__main__":
    main()
