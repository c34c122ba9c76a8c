"""Train state: params + EMA + optimizer state in one pytree.

The reference keeps EMA as a Lightning callback that snapshots params
and swaps them in for every val/test/predict (/root/reference/tqdne/
ema.py).  Here EMA lives *inside* the jitted train step as a fused
tree-lerp — one extra elementwise pass per step, no host sync — and
evaluation simply reads ``state.ema_params``.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    ema_params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "TrainState":
        # ONE jitted program for the whole state build.  Eager per-leaf
        # copy/zeros dispatch ~dozens of micro-compiles through the remote
        # compile tunnel, where a dropped response wedges the process
        # forever (observed on the flagship quality run).  Verified: jit
        # outputs never alias each other or the inputs, so ema/params stay
        # donation-safe distinct buffers.
        def build(p):
            return cls(
                step=jnp.zeros((), jnp.int32),
                params=p,
                # materialize a distinct copy: ema and live params must not
                # alias (the train step donates the state; aliased buffers
                # would be donated twice)
                ema_params=jax.tree_util.tree_map(jnp.copy, p),
                opt_state=tx.init(p),
            )

        return jax.jit(build)(params)


def ema_update(ema_params, params, decay: float):
    """EMA <- decay * EMA + (1-decay) * params (ema.py:24-28 equivalent)."""
    return jax.tree_util.tree_map(lambda e, p: e + (1.0 - decay) * (p - e), ema_params, params)


def apply_updates(
    state: TrainState,
    grads,
    tx: optax.GradientTransformation,
    ema_decay: float = 0.999,
) -> TrainState:
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(
        step=state.step + 1,
        params=new_params,
        ema_params=ema_update(state.ema_params, new_params, ema_decay),
        opt_state=new_opt_state,
    )


def cosine_annealing(lr: float, max_steps: int, eta_min: float = 0.0) -> optax.Schedule:
    """torch CosineAnnealingLR parity: eta_min + (lr-eta_min)(1+cos(pi t/T))/2."""
    return optax.cosine_decay_schedule(
        init_value=lr, decay_steps=max_steps, alpha=eta_min / lr if lr else 0.0
    )


def warmup_cosine(lr: float, warmup_steps: int, total_steps: int) -> optax.Schedule:
    """diffusers get_cosine_schedule_with_warmup parity (for the DDPM module)."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=lr, warmup_steps=warmup_steps, decay_steps=total_steps
    )


def _decay_mask(params):
    """Exclude frozen Fourier-projection weights from weight decay.

    The reference creates them with requires_grad=False
    (blocks.py:15-26), so torch optimizers never touch them; our
    stop_gradient zeroes their grads, but AdamW's decoupled decay would
    still shrink them without this mask.
    """

    def mask_fn(path, leaf):
        return not (path and getattr(path[-1], "key", None) == "W")

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def make_optimizer(
    name: str,
    learning_rate: float | optax.Schedule,
    weight_decay: float = 0.0,
    skip_nonfinite: int = 0,
) -> optax.GradientTransformation:
    """adam / adamw / radam, matching the reference's optimizer choices
    (edm.py:240-246 Adam, autoencoder.py:92-95 AdamW wd=1e-4,
    consistency_model.py:185-187 RAdam).

    skip_nonfinite > 0 (beyond reference, SURVEY §5 failure detection):
    wrap with optax.apply_if_finite(n) — a step whose gradients contain
    NaN/inf applies a zero update instead of poisoning params/opt state,
    erroring only after n consecutive bad steps.  Costs one finiteness
    reduction over the gradient tree per step (~2% at flagship size).
    """
    if name == "adam":
        tx = optax.adam(learning_rate)
    elif name == "adamw":
        tx = optax.adamw(learning_rate, weight_decay=weight_decay, mask=_decay_mask)
    elif name == "radam":
        tx = optax.radam(learning_rate)
    else:
        raise ValueError(f"unknown optimizer {name}")
    if skip_nonfinite:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=skip_nonfinite)
    return tx
