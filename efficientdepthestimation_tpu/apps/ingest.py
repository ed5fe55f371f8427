"""One-command ingestion of the released artifacts the environment can't reach.

The reference publishes six trained ``.pth`` checkpoints
(``README.md:49-56``) and its visual benchmark needs the official
LPIPS-AlexNet weights (``Benchmark/benchmark.py:1389``). Neither is
downloadable in a zero-egress environment, so this app packages the entire
"day egress exists" workflow as one command: acquire (download or mounted
dir) → convert → structurally validate → optionally run the δ1/REL parity
check against the published table.

    # from a mounted directory of artifacts
    ede-ingest --source-dir /mnt/artifacts --out-dir checkpoints/released

    # with network access
    ede-ingest --download --out-dir checkpoints/released \
        --test-csv data/nyu2_test.csv --expect-published

Outputs, per checkpoint found: an imported-and-verified native EDE
checkpoint next to the original, plus ``INGEST_REPORT.json`` summarising
every validation. With ``--expect-published`` (requires ``--test-csv``
pointing at the real NYU-v2 test split) each model's δ1/REL must match the
README table within ``--tolerance`` (default 0.002 — the BASELINE north
star), and the exit code reflects the comparison.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import List, Optional

# README.md:49-56 — name -> (url, delta1, rel)
RELEASED = {
    "ENB0-HU.pth": (0.816, 0.140),
    "ENB4-HU.pth": (0.840, 0.128),
    "RN50-HU.pth": (0.843, 0.125),
    "ENB0-LR.pth": (0.807, 0.144),
    "ENB4-LR.pth": (0.835, 0.130),
    "RN50-LR.pth": (0.849, 0.124),
}
_RELEASE_BASE = ("https://github.com/AnthonyDickson/EfficientDepthEstimation"
                 "/releases/download/v1.0.0/")
# LPIPS inputs: torchvision AlexNet backbone + lpips 0.1.4 linear heads
_LPIPS_SOURCES = {
    "alexnet-owt-7be5be79.pth":
        "https://download.pytorch.org/models/alexnet-owt-7be5be79.pth",
    "lpips_alex.pth":
        "https://github.com/richzhang/PerceptualSimilarity/raw/master/"
        "lpips/weights/v0.1/alex.pth",
}


def _acquire(name: str, url: str, source_dir: Optional[str],
             out_dir: str, download: bool) -> Optional[str]:
    """Find ``name`` in source_dir, else download it to out_dir. None if absent."""
    if source_dir:
        cand = os.path.join(source_dir, name)
        if os.path.isfile(cand):
            return cand
    dest = os.path.join(out_dir, name)
    if os.path.isfile(dest):
        return dest
    if download:
        import urllib.request

        print(f"downloading {url} -> {dest}")
        try:
            urllib.request.urlretrieve(url, dest)
            return dest
        except Exception as exc:  # zero-egress environments land here
            print(f"  download failed: {exc}")
            if os.path.isfile(dest):
                os.remove(dest)
    return None


def _validate_checkpoint(path: str, out_dir: str) -> dict:
    """import_pth → jit forward → finite/shape sanity → native re-export."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from efficientdepthestimation_tpu.apps.common import (
        infer_arch_from_path,
        load_any_checkpoint,
    )
    from efficientdepthestimation_tpu.checkpoints.serialization import (
        save_checkpoint,
    )

    encoder, decoder = infer_arch_from_path(path)
    model, variables = load_any_checkpoint(path)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 228, 304, 3), np.float32))
    out = np.asarray(model.apply(variables, x))
    finite = bool(np.isfinite(out).all())
    n_params = sum(int(np.size(v))
                   for v in jax.tree_util.tree_leaves(variables))
    native = os.path.join(
        out_dir, os.path.basename(path).replace(".pth", ".ede"))
    save_checkpoint(native, variables, encoder=encoder, decoder=decoder)
    return {
        "path": path,
        "encoder": encoder,
        "decoder": decoder,
        "output_shape": list(out.shape),
        "finite": finite,
        "n_params": n_params,
        "native_checkpoint": native,
        "structural_ok": finite and out.ndim == 4,
    }


def _convert_lpips(alexnet_path: str, lpips_path: str, output: str) -> dict:
    """Convert + self-check: LPIPS must be 0 on identical images, finite else."""
    import jax.numpy as jnp
    import numpy as np

    from efficientdepthestimation_tpu.benchmark.metrics import (
        load_lpips_weights,
        lpips_alex,
    )
    from efficientdepthestimation_tpu.checkpoints.lpips_convert import convert

    os.makedirs(os.path.dirname(os.path.abspath(output)), exist_ok=True)
    convert(alexnet_path, lpips_path, output)
    weights = load_lpips_weights(output)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((1, 64, 64, 3), np.float32) * 2 - 1)
    b = jnp.asarray(rng.random((1, 64, 64, 3), np.float32) * 2 - 1)
    d_same = float(jnp.mean(lpips_alex(a, a, weights)))
    d_diff = float(jnp.mean(lpips_alex(a, b, weights)))
    return {
        "output": output,
        "lpips_identity": d_same,
        "lpips_random_pair": d_diff,
        "structural_ok": abs(d_same) < 1e-5 and 0.0 < d_diff < 10.0,
    }


def _accuracy_check(path: str, test_csv: str, tolerance: float) -> dict:
    """Run the full NYU evaluation and compare δ1/REL to the README table."""
    from efficientdepthestimation_tpu.apps import evaluate

    tracker, _ = evaluate.main(["--model", path, "--test-csv", test_csv,
                                "--batch-size", "8"])
    metrics = tracker.to_dict()
    want_d1, want_rel = RELEASED[os.path.basename(path)]
    got_d1 = float(metrics["delta1"])
    got_rel = float(metrics["abs_rel"])
    return {
        "delta1": got_d1, "rel": got_rel,
        "published_delta1": want_d1, "published_rel": want_rel,
        "delta1_ok": abs(got_d1 - want_d1) <= tolerance,
        "rel_ok": abs(got_rel - want_rel) <= tolerance,
    }


def main(args: Optional[List[str]] = None):
    parser = argparse.ArgumentParser(
        description="Acquire/convert/validate the released artifacts")
    parser.add_argument("--source-dir", type=str, default=None,
                        help="mounted directory holding the released .pth "
                             "files and/or LPIPS inputs")
    parser.add_argument("--download", action="store_true",
                        help="fetch anything missing from the public URLs")
    parser.add_argument("--out-dir", type=str, default="checkpoints/released")
    parser.add_argument("--lpips-out", type=str, default="weights/lpips_alex.npz")
    parser.add_argument("--test-csv", type=str, default=None,
                        help="real NYU-v2 test split CSV for the parity check")
    parser.add_argument("--expect-published", action="store_true",
                        help="fail unless δ1/REL match README.md:49-56 within "
                             "--tolerance (needs --test-csv)")
    parser.add_argument("--tolerance", type=float, default=0.002)
    parser.add_argument("--report", type=str, default="INGEST_REPORT.json")
    args = parser.parse_args(args)

    os.makedirs(args.out_dir, exist_ok=True)
    report: dict = {"checkpoints": {}, "lpips": None, "accuracy": {}}
    ok = True

    for name in RELEASED:
        path = _acquire(name, _RELEASE_BASE + name, args.source_dir,
                        args.out_dir, args.download)
        if path is None:
            print(f"[absent ] {name}")
            report["checkpoints"][name] = None
            continue
        entry = _validate_checkpoint(path, args.out_dir)
        report["checkpoints"][name] = entry
        ok &= entry["structural_ok"]
        print(f"[{'ok' if entry['structural_ok'] else 'FAIL':^7}] {name}: "
              f"{entry['n_params']:,} params -> {entry['native_checkpoint']}")

    lpips_paths = {
        key: _acquire(key, url, args.source_dir, args.out_dir, args.download)
        for key, url in _LPIPS_SOURCES.items()
    }
    if all(lpips_paths.values()):
        entry = _convert_lpips(lpips_paths["alexnet-owt-7be5be79.pth"],
                               lpips_paths["lpips_alex.pth"], args.lpips_out)
        report["lpips"] = entry
        ok &= entry["structural_ok"]
        print(f"[{'ok' if entry['structural_ok'] else 'FAIL':^7}] LPIPS -> "
              f"{args.lpips_out} (identity={entry['lpips_identity']:.2e}, "
              f"pair={entry['lpips_random_pair']:.3f})")
    else:
        print("[absent ] LPIPS inputs (alexnet + lpips heads)")

    if args.expect_published:
        if not args.test_csv or not os.path.isfile(args.test_csv):
            parser.error("--expect-published requires an existing --test-csv")
        for name, entry in report["checkpoints"].items():
            if not entry:
                ok = False
                continue
            acc = _accuracy_check(entry["path"], args.test_csv, args.tolerance)
            report["accuracy"][name] = acc
            ok &= acc["delta1_ok"] and acc["rel_ok"]
            print(f"[{'ok' if acc['delta1_ok'] and acc['rel_ok'] else 'FAIL':^7}]"
                  f" {name}: δ1 {acc['delta1']:.3f} (pub {acc['published_delta1']})"
                  f" REL {acc['rel']:.3f} (pub {acc['published_rel']})")

    report["ok"] = bool(ok)
    with open(args.report, "w") as f:
        json.dump(report, f, indent=2)
    print(f"report -> {args.report} (ok={ok})")
    if not ok:
        raise SystemExit(1)
    return report


if __name__ == "__main__":
    main()
