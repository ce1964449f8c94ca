"""Rank the compiled SR train step's HLO instructions by estimated HBM bytes.

The tensorboard xplane converter is broken in this environment (PERF.md), so
this parses the post-optimization HLO text instead: every top-level
instruction in the entry (and while-body) computations is charged
bytes(result) + bytes(operands). Fusions count their parameter and root
shapes only — exactly the buffers that cross HBM (everything inside a fusion
stays in registers/VMEM). That makes the per-op estimate a true HBM-traffic
upper bound modulo aliasing.

Usage: python tools/hlo_bytes.py [--top 40] [--remat_tails] [--config sr|main]
Prints a ranked table + the total, which should track the XLA cost analysis'
"bytes accessed" (363 GB for the round-1 SR step).
"""

from __future__ import annotations

import argparse
import contextlib
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "s64": 8, "u64": 8,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
    "f8e4m3fn": 1, "f8e5m2": 1,
}

# dtype[d0,d1,...]{minor-to-major perm[:T(tile)(subtile)][S(1)]}
SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\](?:\{([^}]*)\})?")
OP_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.*)$")
META_RE = re.compile(r'source_file="([^"]+)"\s+source_line=(\d+)')


def _padded_count(dims, layout):
    """Element count including TPU tile padding from the layout annotation.

    Layout looks like ``3,2,1,0:T(8,128)(2,1)S(1)``: the perm lists dims
    minor-to-major; T(s, l) pads the minormost dim to a multiple of l (lanes)
    and the second-minormost to a multiple of s (sublanes); a (p, 1) subtile
    (bf16/int8 packing) multiplies the sublane quantum by p.
    """
    n = 1
    for d in dims:
        n *= d
    if not layout or ":" not in layout:
        return n
    perm_str, tile_str = layout.split(":", 1)
    tiles = re.findall(r"T?\((\d+(?:,\d+)*)\)", tile_str.split("S(")[0])
    if not tiles:
        return n
    try:
        perm = [int(p) for p in perm_str.split(",") if p.strip()]
    except ValueError:
        return n
    t0 = [int(x) for x in tiles[0].split(",")]
    sub = [int(x) for x in tiles[1].split(",")] if len(tiles) > 1 else [1]
    pad = dict(zip(reversed(perm), reversed(dims)))  # not used; keep dims order
    sizes = list(dims)
    if len(t0) >= 1 and perm:
        lane = t0[-1]
        d = perm[0]
        sizes[d] = -(-sizes[d] // lane) * lane
    if len(t0) >= 2 and len(perm) >= 2:
        sublane = t0[-2] * sub[0]
        d = perm[1]
        sizes[d] = -(-sizes[d] // sublane) * sublane
    m = 1
    for s in sizes:
        m *= s
    return m


def shape_info(shape_str):
    """(hbm_bytes, padded_hbm_bytes) of all non-VMEM shapes in the string."""
    raw = padded = 0
    for m in SHAPE_RE.finditer(shape_str):
        dt, dims_s, layout = m.groups()
        if dt not in DTYPE_BYTES:
            continue
        if layout and "S(1)" in layout:
            continue  # VMEM-resident: no HBM traffic
        dims = [int(d) for d in dims_s.split(",") if d]
        n = 1
        for d in dims:
            n *= d
        raw += n * DTYPE_BYTES[dt]
        padded += _padded_count(dims, layout or "") * DTYPE_BYTES[dt]
    return raw, padded


def parse_hlo(text, top=40):
    """Charge each entry-computation instruction with result+operand HBM bytes."""
    lines = text.splitlines()
    # result shape section = rhs up to the op token "<opname>(".
    op_split = re.compile(r"\s([\w\-]+)\(")

    def split_rhs(rhs):
        m = op_split.search(" " + rhs)
        if not m:
            return None, None, None
        op = m.group(1)
        shape_part = rhs[: m.start()]
        rest = rhs[m.end() - 1:]
        return shape_part, op, rest

    shapes = {}
    for line in lines:
        m = OP_RE.match(line)
        if not m:
            continue
        name, rhs = m.groups()
        shape_part, op, _ = split_rhs(rhs)
        if op:
            shapes[name] = shape_part

    rows = []
    in_entry = False
    for line in lines:
        if line.startswith("ENTRY"):
            in_entry = True
            continue
        if in_entry and line.startswith("}"):
            break
        if not in_entry:
            continue
        m = OP_RE.match(line)
        if not m:
            continue
        name, rhs = m.groups()
        shape_part, op, rest = split_rhs(rhs)
        if not op or op in ("parameter", "constant", "get-tuple-element",
                            "tuple", "bitcast"):
            continue
        raw, padded = shape_info(shape_part)
        operand_text = rest.split(")", 1)[0]
        for ref in re.findall(r"%([\w.\-]+)", operand_text):
            if ref in shapes:
                r2, p2 = shape_info(shapes[ref])
                raw, padded = raw + r2, padded + p2
        sm = META_RE.search(rest)
        src = f"{os.path.basename(sm.group(1))}:{sm.group(2)}" if sm else "?"
        om = re.search(r'op_name="([^"]*)"', rest)
        opname = om.group(1) if om else ""
        rows.append((padded, raw, name, op, src, opname))

    rows.sort(reverse=True)
    total_p = sum(r[0] for r in rows)
    total_r = sum(r[1] for r in rows)
    by_src = defaultdict(int)
    by_kind = defaultdict(int)
    for padded, raw, name, op, src, opname in rows:
        by_src[src] += padded
        # the trailing hlo op inside the fused op_name is the semantic op
        sem = opname.rsplit("/", 1)[-1][:40] if opname else op
        by_kind[f"{op}:{sem}"] += padded

    print(f"entry HBM-byte estimate: padded {total_p/1e9:.1f} GB / raw {total_r/1e9:.1f} GB "
          f"({len(rows)} instructions)")
    print("\n== top instructions (padded GB) ==")
    for padded, raw, name, op, src, opname in rows[:top]:
        print(f"{padded/1e9:8.2f} {raw/1e9:8.2f}  {name[:44]:44s} {src:28s} {opname[-60:]}")
    print("\n== bytes by source line ==")
    for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{v/1e9:9.2f} GB  {k}")
    print("\n== bytes by op kind ==")
    for k, v in sorted(by_kind.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{v/1e9:9.2f} GB  {k}")
    return total_p


def lower_sr(remat_tails=False, remat=False, h=512, w=640, batch=1):
    import numpy as np
    from desr_tpu.options.train_options import TrainOptions
    from desr_tpu.models.main_sr_model import MainSRModel
    from bench import make_batch

    argv = [
        "--model_type", "main", "--SR", "--name", "hlo_bytes",
        "--checkpoints_dir", "/tmp/desr_hlo", "--batch_size", str(batch),
        "--use_image_for_trans", "--use_masked", "--norm_loss", "--use_smooth_loss",
        "--w_syn_norm", "0.05", "--crop_size_h", str(h), "--crop_size_w", str(w),
        "--lr", "2e-5",
    ] + (["--remat_tails"] if remat_tails else []) + (["--remat"] if remat else [])
    with contextlib.redirect_stdout(sys.stderr):
        opt = TrainOptions().parse(argv)
        model = MainSRModel(opt)
        model.setup()
        model.set_input(make_batch(batch, h, w))
        lowered = model.lower_train_step()
    return lowered


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--remat_tails", action="store_true")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--hlo_file", help="parse an existing HLO text dump instead")
    ap.add_argument("--cpu", action="store_true", help="lower for CPU (parser check)")
    ap.add_argument("--h", type=int, default=512)
    ap.add_argument("--w", type=int, default=640)
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    if args.hlo_file:
        with open(args.hlo_file) as f:
            text = f.read()
    else:
        lowered = lower_sr(args.remat_tails, args.remat, h=args.h, w=args.w)
        compiled = lowered.compile()
        text = compiled.as_text()
        try:
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            print(f"XLA cost analysis: {ca.get('flops', 0)/1e12:.2f} TFLOP, "
                  f"{ca.get('bytes accessed', 0)/1e9:.1f} GB accessed", file=sys.stderr)
        except Exception as e:
            print(f"cost_analysis unavailable: {e}", file=sys.stderr)
    parse_hlo(text, args.top)


if __name__ == "__main__":
    main()
