"""Shared harness for the multi-host tests: a deterministic synthetic dataset
and a fixed 3-step SPMD training run over a 4-device data mesh. Used both by
the in-process single-process reference and by the 2-process subprocess
runners — identical code path, so metric equality certifies that the train
app is unchanged between one process and a simulated pod."""

import jax
import numpy as np


def coord_barrier(name: str, timeout_ms: int = 900_000) -> None:
    """Best-effort coordination-service barrier across the processes.

    On this 1-core host the two test processes drift by minutes (model init
    and compiles are serialized by the scheduler), while Gloo's lazy
    context-init window at the FIRST cross-process collective is only 30 s.
    Barriering through the coordination service (whose timeout we control)
    right before each first-of-a-kind collective keeps both processes inside
    Gloo's window. No-op single-process or on any error."""
    if jax.process_count() <= 1:
        return
    try:
        from jax._src import distributed

        distributed.global_state.client.wait_at_barrier(name, timeout_ms)
    except Exception:
        pass


class SynthDataset:
    """10 deterministic (image, depth) pairs; no file I/O."""

    def __init__(self, n=10, image_hw=(32, 48)):
        self.n = n
        self.image_hw = image_hw

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        h, w = self.image_hw
        rng = np.random.default_rng(1000 + idx)
        image = rng.standard_normal((h, w, 3)).astype(np.float32)
        depth = rng.uniform(1, 9, (h // 2, w // 2, 1)).astype(np.float32)
        return image, depth


def run_steps(global_batch_size=4, n_devices=4):
    """Build a tiny model, run one epoch (3 batches, last padded 2/4) over the
    data mesh via distributed_batch_iterator, return final metrics."""
    import jax.numpy as jnp

    from efficientdepthestimation_tpu.models import build_model
    from efficientdepthestimation_tpu.parallel import (
        create_mesh,
        distributed_batch_iterator,
        replicated_sharding,
    )
    from efficientdepthestimation_tpu.training.train_step import (
        adam_with_l2,
        create_train_state,
        make_train_step,
        step_lr,
    )

    mesh = create_mesh(n_devices)
    model = build_model("resnet18", "hu2018")
    x = jnp.zeros((2, 32, 48, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x)
    tx = adam_with_l2(step_lr(1e-3, steps_per_epoch=10), 1e-4)
    state = create_train_state(model, variables, tx)
    # the replicated device_put below is the FIRST cross-process collective
    # (jax verifies replicated values via a process allgather) — align both
    # processes before Gloo context init
    coord_barrier("ede_init_done")
    state = jax.device_put(state, replicated_sharding(mesh))
    step = make_train_step(preprocess=False, donate=False)

    dataset = SynthDataset(n=10)
    feds = [
        {"image": batch["image"], "depth": batch["depth"],
         "num_valid": jnp.asarray(batch["num_valid"], jnp.int32)}
        for batch in distributed_batch_iterator(dataset, global_batch_size,
                                                mesh)
    ]

    # Compile BEFORE the first cross-process collective executes, then
    # barrier through the coordination service. Without this, the faster
    # process reaches the first collective while the other is still
    # compiling (minutes on this 1-core host) and Gloo's 30 s context-init
    # key-value timeout trips (observed flake).
    rng_key = jax.random.PRNGKey(7)
    run = step
    if jax.process_count() > 1:
        run = step.lower(state, feds[0], rng_key).compile()
        coord_barrier("ede_multihost_compiled")

    losses = []
    for fed in feds:
        state, metrics = run(state, fed, rng_key)
        losses.append(float(metrics["loss"]))
    return {
        "losses": losses,
        "final_abs_rel": float(metrics["abs_rel"]),
        "final_step": int(state.step),
        "param_checksum": float(sum(
            np.abs(np.asarray(jax.device_get(p))).sum()
            for p in jax.tree_util.tree_leaves(state.params))),
    }
