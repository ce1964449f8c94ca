"""tools/scaling_report.py: HLO collective parsing + stage plumbing.

The report itself runs offline (tools/README.md); here we pin the byte-exact
parser it is built on, against realistic optimized-HLO text shapes.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

import scaling_report as sr  # noqa: E402


def test_shape_bytes():
    assert sr.shape_bytes("f32[2,3]") == 24
    assert sr.shape_bytes("bf16[8,128]") == 8 * 128 * 2
    # tuple shapes sum their elements
    assert sr.shape_bytes("(f32[4], bf16[4])") == 16 + 8
    assert sr.shape_bytes("pred[]") == 1


def test_collect_collectives_counts_and_bytes():
    hlo = """\
  %ar = f32[1000]{0} all-reduce(f32[1000]{0} %g), replica_groups={{0,1}}
  %ag.1 = bf16[2,64]{1,0} all-gather(bf16[1,64]{1,0} %x), dimensions={0}
  cp = f32[8,8]{1,0} collective-permute(f32[8,8]{1,0} p), source_target_pairs={{0,1}}
  %ars = f32[500]{0} all-reduce-start(f32[500]{0} %h), replica_groups={}
  %notacoll = f32[10]{0} add(f32[10]{0} a, f32[10]{0} b)
"""
    sums, counts = sr.collect_collectives(hlo)
    assert counts == {"all-reduce": 2, "all-gather": 1, "collective-permute": 1}
    assert sums["all-reduce"] == 4000 + 2000
    assert sums["all-gather"] == 2 * 64 * 2
    assert sums["collective-permute"] == 64 * 4


def test_stage_argv_covers_all_stages():
    for stage in ("main", "SR", "I2D", "translation"):
        argv = sr._stage_argv(stage, 1, 64, 64, True, 8, 1)
        assert "--num_devices" in argv and "8" in argv
        batch = sr._stage_batch(stage, 1, 64, 64)
        assert all(hasattr(v, "shape") or isinstance(v, list)
                   for v in batch.values())
    # SR inputs arrive at 2x the crop size (HR canvas)
    b = sr._stage_batch("SR", 1, 64, 64)
    assert b["A_d"].shape == (1, 128, 128, 1)
    assert pytest.approx(b["crop_B"][0].tolist()) == [0, 64, 0, 64]
