"""NYU evaluation + edge metrics — equivalent of ``python -m ReSIDE.test``.

Forward each test batch, align-corners upsample to label size, accumulate
depth metrics and Sobel-edge accuracy/precision/recall/F1 at threshold 0.25
(ReSIDE/test.py:30-102).
"""

from __future__ import annotations

import argparse
from typing import List, Optional

import jax
import jax.numpy as jnp

from efficientdepthestimation_tpu.apps.common import load_any_checkpoint
from efficientdepthestimation_tpu.data import (
    DepthPairDataset,
    batch_iterator,
    eval_preprocess,
)
from efficientdepthestimation_tpu.ops.resize import resize_bilinear_align_corners
from efficientdepthestimation_tpu.training.metrics import (
    MetricsTracker,
    depth_metrics_batch,
    edge_metrics_batch,
)


def main(args: Optional[List[str]] = None):
    from efficientdepthestimation_tpu.utils.jitcache import enable_persistent_cache

    enable_persistent_cache()
    parser = argparse.ArgumentParser(description="NYU evaluation + edge metrics")
    parser.add_argument("--model", default="pretrained_model/model_resnet", type=str)
    parser.add_argument("--test-csv", default="./data/nyu2_test.csv", type=str)
    parser.add_argument("--batch-size", default=1, type=int)
    parser.add_argument("--threshold", default=0.25, type=float)
    args = parser.parse_args(args)

    model, variables = load_any_checkpoint(args.model)

    @jax.jit
    def step(images, depths, num_valid):
        out = model.apply(variables, images)
        out = resize_bilinear_align_corners(out, depths.shape[1:3])
        return (depth_metrics_batch(out, depths, num_valid=num_valid),
                edge_metrics_batch(out, depths, args.threshold,
                                   num_valid=num_valid))

    dataset = DepthPairDataset(args.test_csv, is_test=True)
    tracker = MetricsTracker()
    edge_sums = {"edge_accuracy": 0.0, "edge_precision": 0.0,
                 "edge_recall": 0.0, "edge_f1": 0.0}
    total = 0
    for batch in batch_iterator(dataset, args.batch_size, drop_last=False,
                                pad_last=True):
        images, depths = eval_preprocess(
            jnp.asarray(batch["image"]), jnp.asarray(batch["depth"]))
        depth_sums, edge = jax.device_get(
            step(images, depths, jnp.asarray(batch["num_valid"], jnp.int32)))
        tracker.update_from_sums(depth_sums)
        for key in edge_sums:
            edge_sums[key] += float(edge[key])
        total += int(batch["num_valid"])
        print(f"\rProgress: [{total:02d}/{len(dataset):02d}] {tracker}", end="")
    print()

    print("AV", edge_sums["edge_accuracy"] / total)
    print("PV", edge_sums["edge_precision"] / total)
    print("RV", edge_sums["edge_recall"] / total)
    print("FV", edge_sums["edge_f1"] / total)
    return tracker, {k: v / total for k, v in edge_sums.items()}


if __name__ == "__main__":
    main()
