"""Probe whether JAX's persistent compilation cache works on this backend.

The tunneled axon TPU pays 5-20 min of remote compile for the big train steps
on EVERY process start. If the PJRT-level persistent cache
(``jax_compilation_cache_dir``) can store/replay the remotely-compiled
executables, restarts become cheap. This probe compiles a small-but-not-tiny
program twice in two separate processes against the same cache dir and prints
both wall times plus the cache-dir contents.

    python tools/probe_compile_cache.py /tmp/jaxcache
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

CHILD = r"""
import sys, time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", sys.argv[1])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

def f(x, w):
    for _ in range(8):
        x = jnp.tanh(x @ w)
    return x.sum()

g = jax.jit(jax.grad(f, argnums=1))
x = jnp.ones((512, 512), jnp.bfloat16)
w = jnp.ones((512, 512), jnp.bfloat16)
t0 = time.time()
g.lower(x, w).compile()
print(f"compile_wall={time.time()-t0:.2f}s", flush=True)
"""


def main():
    cache = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxcache_probe"
    os.makedirs(cache, exist_ok=True)
    for run in (1, 2):
        t0 = time.time()
        r = subprocess.run([sys.executable, "-c", CHILD, cache],
                           capture_output=True, text=True)
        tail = [l for l in r.stdout.splitlines() if "compile_wall" in l]
        print(f"run {run}: {tail} total={time.time()-t0:.1f}s rc={r.returncode}")
        if r.returncode:
            print(r.stderr[-500:])
    entries = []
    for root, _, files in os.walk(cache):
        entries += [os.path.join(root, f) for f in files]
    print(f"cache entries: {len(entries)}")
    for e in entries[:5]:
        print(" ", os.path.getsize(e), e)


if __name__ == "__main__":
    main()
