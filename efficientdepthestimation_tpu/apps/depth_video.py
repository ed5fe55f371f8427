"""Side-by-side RGB|depth video — equivalent of ReSIDE/depth_video.py.

Per frame: Scale(640×480) → CenterCrop(608×456) → normalize (the reference
additionally divides by 255 after ToTensor — a bug kept for behavioural
parity, depth_video.py:100) → model → align-corners upsample to 1920×1440 →
inverse-depth colouring 255/(1+d) → crop 180 px letterbox → hstack with the
resized colour frame → DIVX video at 24 fps (depth_video.py:71-124).
"""

from __future__ import annotations

import argparse
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from efficientdepthestimation_tpu.apps.common import load_any_checkpoint, make_infer_fn
from efficientdepthestimation_tpu.data.transforms import (
    center_crop,
    normalize_imagenet,
)
from efficientdepthestimation_tpu.ops.resize import pil_resize


def main(args: Optional[List[str]] = None):
    from efficientdepthestimation_tpu.utils.jitcache import enable_persistent_cache

    enable_persistent_cache()
    parser = argparse.ArgumentParser(description="RGB|depth side-by-side video")
    parser.add_argument("-i", "--image-path", required=True, type=str,
                        help="Directory of video frames.")
    parser.add_argument("-m", "--model-path", required=True, type=str)
    parser.add_argument("-o", "--output-path", default=".", type=str)
    parser.add_argument("--fps", default=24.0, type=float)
    parser.add_argument("--batch-size", default=8, type=int)
    args = parser.parse_args(args)

    import cv2
    from PIL import Image

    model, variables = load_any_checkpoint(args.model_path)
    width, height = 1920, 1440
    border = 180

    crop_w, crop_h = int(640 * 0.95), int(480 * 0.95)

    @jax.jit
    def preprocess(frames_u8):
        x = pil_resize(frames_u8.astype(jnp.float32), (480, 640), "bilinear", True)
        x = center_crop(x, crop_h, crop_w)
        x = normalize_imagenet(x / 255.0)
        return x / 255.0  # parity with the reference's double scaling

    infer = make_infer_fn(model, variables, upsample_to=(height, width))

    checkpoint_name = os.path.splitext(os.path.basename(args.model_path))[0]
    os.makedirs(args.output_path, exist_ok=True)
    out_path = os.path.join(args.output_path, f"{checkpoint_name}.mp4")
    # native streaming MJPEG writer when available (C++ libjpeg, ~1.9× the
    # cv2 DIVX rate on one core), else the reference's DIVX path
    # (depth_video.py:88-91); AsyncVideoWriter takes BGR either way
    from efficientdepthestimation_tpu.utils import AsyncVideoWriter

    video = AsyncVideoWriter(out_path, (2 * width, height - 2 * border),
                             fps=args.fps, fourcc="DIVX")
    print(out_path)

    files = sorted(os.listdir(args.image_path))
    for start in range(0, len(files), args.batch_size):
        chunk = files[start:start + args.batch_size]
        raws = []
        for name in chunk:
            with Image.open(os.path.join(args.image_path, name)) as img:
                raws.append(img.convert("RGB").copy())
        frames = jnp.asarray(np.stack([np.asarray(r) for r in raws]))
        depth = np.asarray(infer(preprocess(frames)))[..., 0]

        for k, raw in enumerate(raws):
            print(f"Frame {start + k + 1:03d}")
            color = raw.resize((width, height), Image.LANCZOS)
            color = color.crop((0, border, width, height - border))
            color = cv2.cvtColor(np.asarray(color), cv2.COLOR_RGB2BGR)

            d = (255.0 / (1.0 + depth[k])).astype(np.uint8)
            assert d.max() <= 255
            d = np.stack(3 * [d], axis=-1)[border:height - border]

            stacked = np.hstack((color, d))
            assert stacked.shape[:2] == (height - 2 * border, 2 * width)
            video.submit(stacked)

    video.cleanup()
    return out_path


if __name__ == "__main__":
    main()
