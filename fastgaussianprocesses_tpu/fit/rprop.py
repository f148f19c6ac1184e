"""Resilient propagation (Rprop) optimizer as a pure JAX transformation.

The reference fits hyperparameters with ``torch.optim.Rprop(lr=1e-1)``
(abstract_fast_gp.py:53-57, standard_gp.py:277-281).  optax has no Rprop, so
this implements the same sign-based rule (torch semantics, including
gradient zeroing on sign flips) as an init/update pair over pytrees, with a
per-leaf trainability mask.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RpropState(NamedTuple):
    step_sizes: dict
    prev_grad: dict


def rprop_init(params, lr: float = 1e-1):
    return RpropState(
        step_sizes=jax.tree.map(lambda p: jnp.full_like(p, lr), params),
        prev_grad=jax.tree.map(jnp.zeros_like, params),
    )


def rprop_update(grads, state: RpropState, params, trainable=None,
                 eta_minus: float = 0.5, eta_plus: float = 1.2,
                 step_min: float = 1e-6, step_max: float = 50.0):
    """One Rprop step.  Returns (new_params, new_state).

    ``trainable``: optional pytree of bools (per leaf) masking which
    parameters move (the reference's requires_grad flags).
    """

    def leaf(p, g, step, gprev, train):
        if not train:
            return p, step, gprev
        sign = g * gprev
        new_step = jnp.where(
            sign > 0,
            jnp.minimum(step * eta_plus, step_max),
            jnp.where(sign < 0, jnp.maximum(step * eta_minus, step_min), step),
        )
        g_eff = jnp.where(sign < 0, jnp.zeros_like(g), g)
        new_p = p - jnp.sign(g_eff) * new_step
        return new_p, new_step, g_eff

    keys = list(params.keys())
    out_p, out_s, out_g = {}, {}, {}
    for k in keys:
        train = True if trainable is None else bool(trainable[k])
        out_p[k], out_s[k], out_g[k] = leaf(params[k], grads[k], state.step_sizes[k],
                                            state.prev_grad[k], train)
    return out_p, RpropState(step_sizes=out_s, prev_grad=out_g)
