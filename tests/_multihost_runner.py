"""Subprocess runner for the 2-process multi-host e2e test.

Usage: python _multihost_runner.py <process_id> <num_processes> <port> <out.json>

Each process sees 2 virtual CPU devices; together they form a 4-device global
mesh. Runs 3 masked SPMD train steps (the last batch padded) through the SAME
code path the train app uses (maybe_initialize_distributed +
distributed_batch_iterator + make_train_step) and writes final metrics.
"""

import json
import os
import sys

process_id, num_processes, port, out_path = (
    int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["EDE_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
os.environ["EDE_NUM_PROCESSES"] = str(num_processes)
os.environ["EDE_PROCESS_ID"] = str(process_id)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402

from efficientdepthestimation_tpu.models import build_model  # noqa: E402
from efficientdepthestimation_tpu.parallel import (  # noqa: E402
    create_mesh,
    distributed_batch_iterator,
    maybe_initialize_distributed,
    replicated_sharding,
)
from efficientdepthestimation_tpu.training.train_step import (  # noqa: E402
    adam_with_l2,
    create_train_state,
    make_train_step,
    step_lr,
)

from multihost_common import SynthDataset, run_steps  # noqa: E402

assert maybe_initialize_distributed(), "distributed init failed"
assert jax.process_count() == num_processes
assert jax.device_count() == 2 * num_processes

result = run_steps(global_batch_size=4)
result["process_count"] = jax.process_count()
with open(out_path, "w") as f:
    json.dump(result, f)
print(f"proc {process_id}: {result}", flush=True)

# Teardown on this 1-core host is racy: jax's atexit distributed shutdown
# runs a 30 s coordination barrier that trips when the two interpreters
# exit at different speeds (observed: 1/2 tasks reach the Shutdown
# barrier). The results this test asserts on are already on disk, so align
# both processes, attempt one clean shutdown, and hard-exit — a
# teardown-only race must not fail the run.
from multihost_common import coord_barrier  # noqa: E402

try:
    coord_barrier("ede_done", 300_000)
    jax.distributed.shutdown()
except Exception as exc:  # teardown-only; results already written
    print(f"proc {process_id}: ignoring teardown race: {exc}", flush=True)
os._exit(0)
