"""Single-image depth demo — equivalent of ``python -m demo`` (ReSIDE/demo.py).

Same CLI contract (-i image/dir, -m model, -o output): architecture inferred
from the model path substrings (demo.py:25-31), output saved as a grayscale
PNG at the model's native half resolution via matplotlib (demo.py:65).
"""

from __future__ import annotations

import argparse
import os
from typing import List, Optional

import jax.numpy as jnp
import matplotlib
import matplotlib.image
import numpy as np

from efficientdepthestimation_tpu.apps.common import (
    infer_arch_from_path,
    load_any_checkpoint,
    make_infer_fn,
)
from efficientdepthestimation_tpu.data import demo_preprocess
from efficientdepthestimation_tpu.models import build_model


def main(args: Optional[List[str]] = None):
    from efficientdepthestimation_tpu.utils.jitcache import enable_persistent_cache

    enable_persistent_cache()
    parser = argparse.ArgumentParser(description="Single-image depth demo")
    parser.add_argument("-i", "--image-path", required=True, type=str,
                        help="An RGB image or a directory of RGB images.")
    parser.add_argument("-m", "--model-path",
                        default="pretrained_model/model_resnet", type=str)
    parser.add_argument("-o", "--output-path", default=None, type=str)
    args = parser.parse_args(args)

    print("Loading model...")
    try:
        model, variables = load_any_checkpoint(args.model_path)
    except ValueError:
        encoder, decoder = infer_arch_from_path(args.model_path)
        model, variables = load_any_checkpoint(
            args.model_path, model=build_model(encoder, decoder))
    infer = make_infer_fn(model, variables)

    if args.output_path:
        os.makedirs(args.output_path, exist_ok=True)

    print("Creating depth maps...")
    rgb_path = os.path.abspath(args.image_path)
    files = (
        [os.path.join(rgb_path, f) for f in os.listdir(rgb_path)]
        if os.path.isdir(rgb_path) else [rgb_path]
    )
    for path in files:
        run_one(infer, path, args.output_path)
    print("Done.")


def run_one(infer, rgb_path: str, output_path: str | None):
    from PIL import Image

    directory, file = os.path.split(rgb_path)
    file = f"{file.split('.')[0]}.png"
    depth_path = (os.path.join(output_path, file) if output_path
                  else os.path.join(directory, f"out_{file}"))
    print(f"{rgb_path} -> {depth_path}")

    with Image.open(rgb_path) as img:
        rgb = np.asarray(img.convert("RGB"))
    images = demo_preprocess(jnp.asarray(rgb[None]))
    out = np.asarray(infer(images))[0, :, :, 0]
    matplotlib.image.imsave(depth_path, out, cmap="gray")


if __name__ == "__main__":
    main()
