"""Probe which XLA compiler options the (possibly remote) TPU compiler accepts.

The tunnel's compile service rejects unknown options with an error at
``lowered.compile(compiler_options=...)`` time, so a tiny throwaway program
is enough to test acceptance without paying a full-model compile.

    python tools/probe_compiler_options.py xla_tpu_foo=true xla_bar=1
    python tools/probe_compiler_options.py --builtin   # probe the curated list

Prints one line per option: ACCEPTED / REJECTED (+ the error head). Used for
the PERF.md compiler-option campaigns (an accepted option still needs a
step-level A/B via tools/ab_step.py before any default changes).
"""

from __future__ import annotations

import argparse
import sys

# Candidate names gathered from public XLA debug_options_flags / TPU-specific
# option lists; acceptance varies by compiler build, hence the probe.
BUILTIN = [
    # generic pass-disable escape hatch (DebugOptions repeated field): if the
    # backend runs the open-source SpaceToBatchConverter, this kills it by name
    "xla_disable_hlo_passes=space-to-batch-converter",
    # space-to-batch / conv layout related
    "xla_tpu_enable_space_to_batch=false",
    "xla_tpu_space_to_batch=false",
    "xla_enable_space_to_batch=false",
    "xla_tpu_conv_space_to_batch=false",
    "xla_tpu_use_space_to_batch_for_convolutions=false",
    "xla_tpu_enable_experimental_space_to_batch=false",
    "xla_tpu_layout_use_dot_grouping=false",
    "xla_tpu_enable_aggressive_loop_fusion_layout_opt=true",
    # fusion / copy related
    "xla_tpu_rwb_fusion=false",
    "xla_tpu_enable_copy_fusion=true",
    "xla_tpu_copy_with_multiple_strides_in_loop_fusion=true",
    "xla_tpu_licm_size_inflation_ratio=1",
    "xla_tpu_vector_load_fusion_window=2048",
    "xla_tpu_vector_store_fusion_window=1024",
    # scheduling / memory
    "xla_tpu_enable_latency_hiding_scheduler=true",
    "xla_tpu_async_copy_bandwidth_scaling_factor=1.0",
    "xla_tpu_scoped_vmem_limit_kib=32768",
    "xla_tpu_allocate_scoped_vmem_at_same_offset=false",
    "xla_latency_hiding_scheduler_rerun=2",
    "xla_tpu_memory_bound_loop_optimizer_options=enabled:true",
    "xla_tpu_use_bundle_aware_cost_model_for_fusions=true",
    "xla_tpu_dot_dot_fusion=true",
    "xla_tpu_perform_spmd_cse_prevention=false",
]


def probe(option: str) -> tuple[bool, str]:
    import jax
    import jax.numpy as jnp

    key, _, val = option.partition("=")
    lowered = jax.jit(lambda x: x * 2.0 + 1.0).lower(jnp.ones((8, 128)))
    try:
        lowered.compile(compiler_options={key: val})
        return True, ""
    except Exception as e:  # noqa: BLE001 - report any rejection
        return False, str(e).split("\n")[0][:160]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("options", nargs="*", help="key=value options to probe")
    ap.add_argument("--builtin", action="store_true",
                    help="probe the curated candidate list")
    args = ap.parse_args()
    opts = list(args.options) + (BUILTIN if args.builtin or not args.options
                                 else [])
    ok = []
    for o in opts:
        accepted, err = probe(o)
        print(f"{'ACCEPTED' if accepted else 'REJECTED'}  {o}"
              + (f"  ({err})" if err else ""), flush=True)
        if accepted:
            ok.append(o)
    print("\naccepted:", " ".join(ok) if ok else "(none)")
    return


if __name__ == "__main__":
    sys.exit(main())
