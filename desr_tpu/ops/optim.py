"""Adam optimizer with exact torch.optim.Adam semantics.

The reference trains every stage with torch Adam (e.g.
models/main_model.py:176, models/translation_model.py:117-118, where the
generator optimizer uses weight_decay as classic L2-into-gradient). We
implement Adam directly (rather than optax) so that:

- the learning rate is a plain scalar argument to ``adam_update`` — LR
  schedules never trigger recompilation of the jitted train step;
- weight decay matches torch exactly (decay added to the raw gradient before
  the moment updates, torch.optim.Adam docs);
- the state is a simple pytree (step, m, v) that shards trivially under pjit.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    step: jnp.ndarray  # scalar int32
    m: Any  # pytree like params
    v: Any  # pytree like params


def adam_init(params):
    # m and v must be distinct buffers (donation would alias them otherwise)
    m = jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, dtype=jnp.float32), params)
    v = jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, dtype=jnp.float32), params)
    return AdamState(step=jnp.zeros((), jnp.int32), m=m, v=v)


def adam_update(grads, state, params, lr, b1=0.5, b2=0.999, eps=1e-8, weight_decay=0.0):
    """One Adam step. Returns (new_params, new_state).

    b1 default 0.5 matches the reference's ``--beta1`` default
    (options/train_options.py:33). Note models/main_model.py:176 constructs
    Adam with only lr (torch default betas (0.9, 0.999)) — callers pass the
    right betas per stage.
    """
    step = state.step + 1
    stepf = step.astype(jnp.float32)
    bc1 = 1.0 - jnp.power(b1, stepf)
    bc2 = 1.0 - jnp.power(b2, stepf)

    def upd(p, g, m, v):
        g = g.astype(jnp.float32)
        if weight_decay:
            g = g + weight_decay * p.astype(jnp.float32)
        m = b1 * m + (1.0 - b1) * g
        v = b2 * v + (1.0 - b2) * g * g
        mh = m / bc1
        vh = v / bc2
        new_p = p.astype(jnp.float32) - lr * mh / (jnp.sqrt(vh) + eps)
        return new_p.astype(p.dtype), m, v

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.m)
    flat_v = treedef.flatten_up_to(state.v)
    out = [upd(p, g, m, v) for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v)]
    new_params = treedef.unflatten([o[0] for o in out])
    new_m = treedef.unflatten([o[1] for o in out])
    new_v = treedef.unflatten([o[2] for o in out])
    return new_params, AdamState(step=step, m=new_m, v=new_v)


def lr_schedule(policy, epoch, base_lr, n_epochs, n_epochs_decay, epoch_count=1, lr_decay_iters=50):
    """Per-epoch LR, matching models/networks.py:40-66 get_scheduler.

    linear: flat for n_epochs then linear decay to 0 over n_epochs_decay+1.
    step:   x0.1 every lr_decay_iters epochs.
    cosine: CosineAnnealingLR with T_max=n_epochs, eta_min=0.
    (plateau requires a metric feed; handled by the trainer.)
    """
    import math

    if policy == "linear":
        scale = 1.0 - max(0, epoch + epoch_count - n_epochs) / float(n_epochs_decay + 1)
        return base_lr * scale
    if policy == "step":
        return base_lr * (0.1 ** (epoch // lr_decay_iters))
    if policy == "cosine":
        return base_lr * (1 + math.cos(math.pi * epoch / n_epochs)) / 2
    raise NotImplementedError(f"lr policy {policy}")
