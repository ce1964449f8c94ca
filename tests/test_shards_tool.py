"""tools/test_shards.py: shards exactly partition the test files."""

import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO_ROOT, "tools"))


def test_shards_partition():
    import glob

    import test_shards

    for n in (2, 3):
        shards, loads = test_shards.shard_files(n)
        flat = sorted(f for s in shards for f in s)
        files = sorted(os.path.basename(p) for p in
                       glob.glob(os.path.join(REPO_ROOT, "tests", "test_*.py")))
        assert flat == files, f"n={n}: not a partition"
        # balanced within 2x (LPT guarantee is much tighter; this guards
        # against a degenerate weight table)
        assert max(loads) < 2 * min(loads)


def test_shards_cli():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "tools", "test_shards.py"),
         "1/2"], capture_output=True, text=True, check=True)
    files = out.stdout.split()
    assert files and all(f.startswith("tests/test_") for f in files)
    chk = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "tools", "test_shards.py"),
         "--check"], capture_output=True, text=True, check=True)
    assert chk.stdout.startswith("OK:")
