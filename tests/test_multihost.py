"""Multi-host runtime tests (VERDICT round-1 item 4).

Single-process identities run in-process; the real 2-process run (Gloo
collectives over a 4-device CPU "pod") is exercised via subprocesses and
compared metric-for-metric against the single-process reference — the train
path is unchanged between one chip and a simulated multi-process mesh.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from efficientdepthestimation_tpu.parallel import (
    create_mesh,
    distributed_batch_iterator,
    make_global_batch,
    maybe_initialize_distributed,
    process_local_rows,
)
from efficientdepthestimation_tpu.data import batch_iterator

from multihost_common import SynthDataset, run_steps


def test_maybe_initialize_is_noop_without_env(monkeypatch):
    for var in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                "EDE_COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    assert maybe_initialize_distributed() is False
    assert jax.process_count() == 1


def test_process_local_rows_single_process_is_identity():
    mesh = create_mesh(8)
    rows = process_local_rows(mesh, 16)
    np.testing.assert_array_equal(rows, np.arange(16))


def test_distributed_iterator_matches_batch_iterator_single_process():
    mesh = create_mesh(4)
    dataset = SynthDataset(n=10)
    ref_batches = list(batch_iterator(dataset, 4, pad_last=True))
    got_batches = list(distributed_batch_iterator(dataset, 4, mesh))
    assert len(ref_batches) == len(got_batches) == 3
    for ref, got in zip(ref_batches, got_batches):
        assert got["num_valid"] == ref["num_valid"]
        np.testing.assert_array_equal(np.asarray(got["image"]), ref["image"])
        np.testing.assert_array_equal(np.asarray(got["depth"]), ref["depth"])
        # and the arrays really are sharded over the data axis
        assert len(got["image"].sharding.device_set) == 4


def test_distributed_iterator_skip_batches_matches_tail():
    """Mid-epoch resume contract: skipping N batches yields exactly the
    batches a full pass would have produced from position N (same shuffle
    seed), for both iterators."""
    mesh = create_mesh(4)
    dataset = SynthDataset(n=10)
    for it, kwargs in ((distributed_batch_iterator, dict(mesh=mesh)),
                       (batch_iterator, dict(pad_last=True))):
        full = list(it(dataset, 4, shuffle=True, seed=3, **kwargs))
        tail = list(it(dataset, 4, shuffle=True, seed=3, skip_batches=1,
                       **kwargs))
        assert len(tail) == len(full) - 1
        for ref, got in zip(full[1:], tail):
            assert got["num_valid"] == ref["num_valid"]
            np.testing.assert_array_equal(np.asarray(got["image"]),
                                          np.asarray(ref["image"]))


def test_make_global_batch_shards_data_axis():
    mesh = create_mesh(8)
    batch = make_global_batch(
        {"image": np.zeros((8, 4, 4, 3), np.float32), "num_valid": 5}, mesh)
    assert len(batch["image"].sharding.device_set) == 8
    assert batch["num_valid"] == 5


@pytest.mark.slow
def test_two_process_run_matches_single_process(tmp_path):
    """Launch 2 real processes (2 virtual CPU devices each) and compare the
    full 3-step training trajectory against the in-process reference."""
    reference = run_steps(global_batch_size=4, n_devices=4)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    runner = os.path.join(os.path.dirname(__file__), "_multihost_runner.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(runner)), os.path.dirname(runner)])

    def launch(port):
        procs, tails = [], []
        for pid in range(2):
            procs.append(subprocess.Popen(
                [sys.executable, runner, str(pid), "2", str(port),
                 str(tmp_path / f"proc{pid}.json")],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
        for p in procs:
            stdout, _ = p.communicate(timeout=1200)
            tails.append(stdout.decode()[-3000:])
        return [p.returncode for p in procs], tails

    codes, tails = launch(port)
    if any(codes):
        # Known 1-core-host flake class: under external load the two
        # processes drift past a 30 s Gloo window at some first-of-a-kind
        # collective. The runner barriers around init/compile/exit; one
        # retry (fresh port) covers whatever timing hole remains.
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        codes, tails = launch(port)
    for code, tail in zip(codes, tails):
        assert code == 0, tail

    outs = [tmp_path / f"proc{pid}.json" for pid in range(2)]

    results = [json.loads(out.read_text()) for out in outs]
    for result in results:
        assert result["process_count"] == 2
        assert result["final_step"] == reference["final_step"] == 3
        # Step 1 runs on identical params+data → near-bitwise equality.
        # Later steps accumulate f32 reduction-order differences between the
        # single-device gradient reduce and the cross-process Gloo all-reduce,
        # amplified by Adam's rescaling — a collective-implementation property,
        # not a data-path bug (measured ≤7e-4 after 3 steps).
        np.testing.assert_allclose(result["losses"][0], reference["losses"][0],
                                   rtol=1e-6)
        np.testing.assert_allclose(result["losses"], reference["losses"],
                                   rtol=5e-3)
        # abs_rel after 3 steps is the most chaotic of the tail checks
        # (metric of a prediction that moved 3 Adam steps); observed up to
        # 0.6% drift between runs of this very comparison
        np.testing.assert_allclose(result["final_abs_rel"],
                                   reference["final_abs_rel"], rtol=2e-2)
        np.testing.assert_allclose(result["param_checksum"],
                                   reference["param_checksum"], rtol=1e-3)
