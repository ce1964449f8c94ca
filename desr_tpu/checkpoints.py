"""Checkpoint save/load with the reference's on-disk contract.

Artifacts are real PyTorch ``.pth`` files, one per net:
``checkpoints/<name>/<epoch>_net_<NetName>.pth`` (reference:
models/base_model.py:150-166). Because our parameter trees are flat dicts
keyed by torch ``state_dict`` names, saving is a dtype conversion and loading
is the reference's tolerant merge re-implemented:

- nested ``{'netG_B': state_dict}`` unwrap for legacy ``latest_net_G_A_d.pth``
  (base_model.py:204-205)
- key-intersection AND shape-match filtering, then merge into the current
  params (base_model.py:218-228) — this is what makes the cross-stage weight
  handoff (README.md:58-66) work
- missing files / unreadable checkpoints are tolerated (base_model.py:235-237),
  with a warning instead of the reference's silent swallow
- legacy InstanceNorm ``running_mean/var`` keys are dropped (we never carry
  them; base_model.py:168-180 patches them away)

Orbax-based full-train-state checkpointing (params + optimizer moments +
step), which the reference lacks, is provided by ``save_train_state`` /
``load_train_state`` for preemption-safe resume.
"""

from __future__ import annotations

import os
import warnings
from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp


def _torch():
    import torch

    return torch


def save_net(params: Dict[str, jnp.ndarray], path: str):
    """Write a flat param dict as a torch state_dict .pth file."""
    torch = _torch()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    state = {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sorted(params.items())}
    torch.save(state, path)


def load_net(params: Dict[str, jnp.ndarray], path: str,
             verbose: bool = True) -> Dict[str, jnp.ndarray]:
    """Tolerant partial load: returns params merged with matching entries."""
    torch = _torch()
    if not os.path.exists(path):
        if verbose:
            warnings.warn(f"checkpoint {path} not found; keeping initialization")
        return params
    try:
        state = torch.load(path, map_location="cpu", weights_only=False)
    except Exception as e:  # noqa: BLE001 — mirror reference tolerance
        warnings.warn(f"failed to load {path}: {e}; keeping initialization")
        return params
    # legacy nested dict (whole-model save), base_model.py:204-205
    if "netG_B" in state and not any(k in params for k in state):
        state = state["netG_B"]
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    out = dict(params)
    n_loaded = 0
    for k, v in state.items():
        k2 = k[len("module."):] if k.startswith("module.") else k
        if k2 not in out:
            continue
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        if tuple(arr.shape) != tuple(np.shape(out[k2])):
            continue
        out[k2] = jnp.asarray(arr, dtype=jnp.asarray(out[k2]).dtype)
        n_loaded += 1
    if verbose:
        print(f"loaded {n_loaded}/{len(out)} tensors from {path}")
    return out


def net_ckpt_path(checkpoints_dir: str, name: str, epoch, net_name: str) -> str:
    return os.path.join(checkpoints_dir, name, f"{epoch}_net_{net_name}.pth")


def save_networks(all_params: Dict[str, Dict[str, jnp.ndarray]],
                  checkpoints_dir: str, name: str, epoch):
    """Save every net of a model under the reference naming convention."""
    for net_name, params in all_params.items():
        save_net(params, net_ckpt_path(checkpoints_dir, name, epoch, net_name))


def load_networks(all_params: Dict[str, Dict[str, jnp.ndarray]],
                  checkpoints_dir: str, name: str, epoch,
                  verbose: bool = True) -> Dict[str, Dict[str, jnp.ndarray]]:
    out = {}
    for net_name, params in all_params.items():
        path = net_ckpt_path(checkpoints_dir, name, epoch, net_name)
        out[net_name] = load_net(params, path, verbose=verbose)
    return out


# ---------------------------------------------------------------------------
# Full-train-state checkpointing (params + optimizer moments), via Orbax.
# ---------------------------------------------------------------------------


def save_train_state(state_pytree, directory: str, step: int):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, f"state_{step}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state_pytree, force=True)
    ckptr.wait_until_finished()
    return path


def load_train_state(template_pytree, directory: str, step: Optional[int] = None):
    import orbax.checkpoint as ocp

    if step is None:
        cands = [d for d in os.listdir(directory) if d.startswith("state_")]
        if not cands:
            raise FileNotFoundError(f"no train state under {directory}")
        step = max(int(d.split("_")[1]) for d in cands)
    path = os.path.abspath(os.path.join(directory, f"state_{step}"))
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template_pytree), step
