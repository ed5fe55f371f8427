"""Comparison grid over all checkpoints — equivalent of ReSIDE/examples.py.

Runs each checkpoint on the first test batch and writes depth PNGs normalized
by the *global* max depth across all models so panels are comparable
(examples.py:96-116).
"""

from __future__ import annotations

import argparse
import os
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from efficientdepthestimation_tpu.apps.common import load_any_checkpoint, make_infer_fn
from efficientdepthestimation_tpu.data import (
    DepthPairDataset,
    batch_iterator,
    eval_preprocess,
)


def main(args: Optional[List[str]] = None):
    from efficientdepthestimation_tpu.utils.jitcache import enable_persistent_cache

    enable_persistent_cache()
    parser = argparse.ArgumentParser(description="Example depth maps per checkpoint")
    parser.add_argument("-c", "--checkpoint-dir", required=True, type=str)
    parser.add_argument("--test-csv", default="./data/nyu2_test.csv", type=str)
    parser.add_argument("-b", "--batch-size", default=4, type=int)
    parser.add_argument("-o", "--output-dir", default="examples_out", type=str)
    args = parser.parse_args(args)

    dataset = DepthPairDataset(args.test_csv, is_test=True)
    batch = next(batch_iterator(dataset, args.batch_size, pad_last=True))
    images, depths = eval_preprocess(
        jnp.asarray(batch["image"]), jnp.asarray(batch["depth"]))

    outputs = {}
    for filename in sorted(os.listdir(args.checkpoint_dir)):
        if not filename.endswith((".pth", ".ede")):
            continue
        path = os.path.join(args.checkpoint_dir, filename)
        model, variables = load_any_checkpoint(path)
        infer = make_infer_fn(model, variables, upsample_to=depths.shape[1:3])
        outputs[os.path.splitext(filename)[0]] = np.asarray(infer(images))[..., 0]

    # Normalize by the max depth across ALL models + GT (examples.py:96-116)
    global_max = max([float(np.asarray(depths).max())]
                     + [float(o.max()) for o in outputs.values()])
    os.makedirs(args.output_dir, exist_ok=True)

    from PIL import Image

    for i in range(images.shape[0]):
        gt = np.asarray(depths)[i, :, :, 0] / global_max
        Image.fromarray((gt * 255).astype(np.uint8)).save(
            os.path.join(args.output_dir, f"sample{i:02d}_gt.png"))
        for name, out in outputs.items():
            arr = np.clip(out[i] / global_max, 0, 1)
            Image.fromarray((arr * 255).astype(np.uint8)).save(
                os.path.join(args.output_dir, f"sample{i:02d}_{name}.png"))
    print(f"Wrote {images.shape[0]} samples × {len(outputs)} models "
          f"to {args.output_dir} (global max {global_max:.2f} m)")
    return outputs


if __name__ == "__main__":
    main()
