"""Full test-set depth export — equivalent of ReSIDE/test_nyu.py.

For each checkpoint: run the test split, upsample predictions to 640×480,
clamp >10 m to 0, write ×1000 uint16 PNGs plus ÷10000 preview JPGs through an
async image writer (test_nyu.py:19-22,82-94).
"""

from __future__ import annotations

import argparse
import os
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from efficientdepthestimation_tpu.apps.common import load_any_checkpoint, make_serving_fn
from efficientdepthestimation_tpu.data import (
    DepthPairDataset,
    batch_iterator,
    eval_preprocess,
)
from efficientdepthestimation_tpu.utils import AsyncImageWriter


def write_depth(image: np.ndarray, path: str):
    from efficientdepthestimation_tpu.native import encoder

    depth16 = image.astype(np.uint16)
    if encoder.is_available():
        return encoder.encode_png(path, depth16)
    from PIL import Image

    Image.fromarray(depth16).save(path)


def write_preview(image: np.ndarray, path: str):
    from efficientdepthestimation_tpu.native import encoder

    gray = (image * 255).astype(np.uint8)
    if encoder.is_available():
        return encoder.encode_jpeg(path, gray)
    from PIL import Image

    Image.fromarray(gray).save(path)


def main(args: Optional[List[str]] = None):
    from efficientdepthestimation_tpu.utils.jitcache import enable_persistent_cache

    enable_persistent_cache()
    parser = argparse.ArgumentParser(description="Export test-set depth maps")
    parser.add_argument("-c", "--checkpoint-dir", required=True, type=str)
    parser.add_argument("--test-csv", default="./data/nyu2_test.csv", type=str)
    parser.add_argument("-b", "--batch-size", default=8, type=int)
    parser.add_argument("-o", "--output-dir", default="nyu_depth_out", type=str)
    parser.add_argument("--policy", default=None, type=str,
                        help="serving-policy JSON from apps.autotune")
    args = parser.parse_args(args)

    dataset = DepthPairDataset(args.test_csv, is_test=True)
    for filename in sorted(os.listdir(args.checkpoint_dir)):
        if not filename.endswith((".pth", ".ede")):
            continue
        name = os.path.splitext(filename)[0]
        out_dir = os.path.join(args.output_dir, name)
        os.makedirs(out_dir, exist_ok=True)
        model, variables = load_any_checkpoint(
            os.path.join(args.checkpoint_dir, filename))
        infer = make_serving_fn(model, variables, upsample_to=(480, 640),
                                batch_hint=args.batch_size,
                                policy_path=args.policy)

        index = 0
        with AsyncImageWriter() as writer:
            for batch in batch_iterator(dataset, args.batch_size, pad_last=True):
                images, _ = eval_preprocess(
                    jnp.asarray(batch["image"]), jnp.asarray(batch["depth"]))
                out = np.asarray(infer(images))[..., 0]
                out = np.where(out > 10.0, 0.0, out)  # clamp (test_nyu.py:88)
                for k in range(int(batch["num_valid"])):
                    depth_mm = (out[k] * 1000.0)
                    writer.submit(depth_mm, os.path.join(out_dir, f"{index:04d}.png"),
                                  writer=write_depth)
                    writer.submit(depth_mm / 10000.0,
                                  os.path.join(out_dir, f"{index:04d}.jpg"),
                                  writer=write_preview)
                    index += 1
        print(f"{name}: wrote {index} depth maps to {out_dir}")


if __name__ == "__main__":
    main()
