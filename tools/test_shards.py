"""Deterministic test-suite sharding for time-budgeted CI runs.

The cold suite compiles every model program from scratch and has grown past a
40-minute single-process budget (VERDICT r4 #9: 44 min at round 4, larger now
with the round-5 multi-device and head-to-head chain tests). Test FILES are
fully independent (each builds its own models/fixtures; the only shared state
is the persistent XLA compile cache, which is concurrency-safe), so the suite
splits cleanly:

    python -m pytest $(python tools/test_shards.py 1/2) -q   # shard 1
    python -m pytest $(python tools/test_shards.py 2/2) -q   # shard 2

Shards are balanced by a measured/estimated cold-cost table (greedy
longest-processing-time). Weights only affect balance, not correctness —
every test file lands in exactly one shard, asserted by --check.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

TESTS_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests")

# cold single-core seconds (measured where known, estimated otherwise);
# unlisted files default to DEFAULT_W
WEIGHTS = {
    "test_parallel.py": 700,        # 8-dev mesh compiles for 4 stages
    "test_quality_eval.py": 650,    # three both-framework train chains
    "test_model_main.py": 250,      # measured 247 s cold (round 2)
    "test_lockstep.py": 220,
    "test_cli_integration.py": 160,  # measured ~2.5 min
    "test_model_translation.py": 150,
    "test_loss_oracle.py": 130,
    "test_model_sr.py": 120,
    "test_predict_cli.py": 120,
    "test_networks_parity.py": 100,
    "test_serving_export.py": 90,
    "test_multi_step.py": 80,
    "test_model_i2d.py": 80,
    "test_remat_blocks.py": 60,
    "test_device_aug.py": 60,
    "test_bf16_and_plateau.py": 60,
    "test_stage_handoff.py": 50,
    "test_batchnorm_stats.py": 40,
}
DEFAULT_W = 25


def shard_files(n_shards):
    files = sorted(os.path.basename(p)
                   for p in glob.glob(os.path.join(TESTS_DIR, "test_*.py")))
    # greedy LPT: heaviest first into the currently lightest shard
    order = sorted(files, key=lambda f: (-WEIGHTS.get(f, DEFAULT_W), f))
    shards = [[] for _ in range(n_shards)]
    loads = [0] * n_shards
    for f in order:
        i = loads.index(min(loads))
        shards[i].append(f)
        loads[i] += WEIGHTS.get(f, DEFAULT_W)
    return [sorted(s) for s in shards], loads


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("shard", nargs="?", default="1/2",
                   help="K/N, e.g. 1/2 = first of two shards")
    p.add_argument("--check", action="store_true",
                   help="assert the shards exactly partition tests/")
    args = p.parse_args(argv)
    k, n = (int(x) for x in args.shard.split("/"))
    assert 1 <= k <= n, f"bad shard spec {args.shard}"
    shards, loads = shard_files(n)
    if args.check:
        allf = sorted(f for s in shards for f in s)
        files = sorted(os.path.basename(p) for p in
                       glob.glob(os.path.join(TESTS_DIR, "test_*.py")))
        assert allf == files, "shards do not partition tests/"
        print("OK:", {i + 1: f"{len(s)} files ~{w}s"
                      for i, (s, w) in enumerate(zip(shards, loads))})
        return
    print(" ".join(os.path.join("tests", f) for f in shards[k - 1]))


if __name__ == "__main__":
    main()
