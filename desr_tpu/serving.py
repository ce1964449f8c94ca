"""AOT serving export: serialize the pruned serving graph to a portable artifact.

The reference has no deployment story at all — its only inference path is
``main.py --do_test`` re-building the whole training stack (reference
main.py:121-160). ``predict.py`` already gives a serving CLI; this module
adds the TPU-native *export* half: the dead-code-eliminated serving forward
(real branch only, see predict.py) is lowered once with ``jax.export`` and
serialized to disk together with the weights, so a serving host can run it

- without the options system, model classes, or torch-format checkpoint
  parsing on its import path,
- with a version-pinned compute graph (StableHLO) that is immune to model-code
  drift between export and deployment, and
- on either TPU or CPU (the artifact is lowered for both platforms).

Artifact layout (one directory):
    serving.jaxexp   serialized ``jax.export.Exported`` (StableHLO + calling
                     convention; multi-platform)
    params.npz       flat weights, keys ``<net>/<torch state_dict key>``
    manifest.json    shapes/dtypes of the batch contract, output key, scale,
                     provenance (experiment name, epoch, jax version)

The exported callable has signature ``(params, batch, seed) -> prediction``
where ``batch`` is the same dict ``predict.py`` builds (A_d/B_d/A_i/B_i/K_A/
K_B/crop_A/crop_B) at the geometry frozen in the manifest, and ``seed`` is a
uint32 scalar (the eval-mode rect-hole synthesis consumes a key; p=0 at eval,
but the graph still threads it). Static shapes are deliberate: TPU/XLA
compiles one program per geometry, and serving at a fixed padded geometry is
exactly how ``predict.py`` already batches (pad to /128, crop back).
"""

from __future__ import annotations

import json
import os

import numpy as np

MANIFEST = "manifest.json"
GRAPH = "serving.jaxexp"
WEIGHTS = "params.npz"

_SEP = "/"  # npz key separator: <net>/<torch key> (torch keys contain dots)


def _flatten_params(params):
    return {f"{net}{_SEP}{k}": np.asarray(v)
            for net, sub in params.items() for k, v in sub.items()}


def _unflatten_params(flat):
    out = {}
    for kk, v in flat.items():
        net, _, k = kk.partition(_SEP)
        out.setdefault(net, {})[k] = v
    return out


def export_serving(model, batch, out_dir, output_key, *,
                   platforms=("tpu", "cpu"), provenance=None):
    """Lower the serving forward at ``batch``'s geometry and write the artifact.

    ``model`` is a constructed+setup MainModel/MainSRModel; ``batch`` a host
    (numpy) batch dict exactly as predict.py builds it — only its
    shapes/dtypes are used. Returns the manifest dict.
    """
    import jax
    import jax.numpy as jnp

    forward = model._forward_fn()

    def fwd(params, b, seed):
        rng = jax.random.PRNGKey(seed)
        return forward(params, b, rng, False)[output_key]

    batch_avals = {k: jax.ShapeDtypeStruct(np.shape(v), np.asarray(v).dtype)
                   for k, v in batch.items()}
    params_avals = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), dict(model.params))
    exported = jax.export.export(jax.jit(fwd), platforms=list(platforms))(
        params_avals, batch_avals, jax.ShapeDtypeStruct((), np.uint32))

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, GRAPH), "wb") as f:
        f.write(exported.serialize())
    np.savez(os.path.join(out_dir, WEIGHTS),
             **_flatten_params(jax.device_get(model.params)))
    manifest = {
        "output_key": output_key,
        "batch": {k: [list(v.shape), v.dtype.name] for k, v in batch_avals.items()},
        "out_scale": 2 if output_key.endswith("_hr") else 1,
        "sr": output_key.endswith("_hr"),
        "compute_dtype": str(model.opt.compute_dtype),
        "platforms": list(platforms),
        "jax_version": jax.__version__,
        "provenance": provenance or {},
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def load_serving(artifact_dir):
    """Load an exported artifact: returns ``(fn, params, manifest)``.

    ``fn(params, batch, seed)`` is the jitted deserialized graph; ``batch``
    must match the manifest geometry exactly (checked, with a readable error).
    """
    import jax

    with open(os.path.join(artifact_dir, MANIFEST)) as f:
        manifest = json.load(f)
    with open(os.path.join(artifact_dir, GRAPH), "rb") as f:
        exported = jax.export.deserialize(f.read())
    with np.load(os.path.join(artifact_dir, WEIGHTS)) as z:
        params = _unflatten_params({k: z[k] for k in z.files})

    call = jax.jit(exported.call)
    spec = manifest["batch"]

    def fn(p, batch, seed=0):
        got = {k: [list(np.shape(v)), np.asarray(v).dtype.name]
               for k, v in batch.items()}
        if got != spec:
            diff = {k: (got.get(k), spec.get(k))
                    for k in set(got) | set(spec) if got.get(k) != spec.get(k)}
            raise ValueError(
                f"batch does not match the exported geometry: {diff}. "
                f"The artifact is compiled for fixed shapes; re-export for "
                f"this geometry or pad/batch to match.")
        return call(p, batch, np.uint32(seed))

    return fn, params, manifest
