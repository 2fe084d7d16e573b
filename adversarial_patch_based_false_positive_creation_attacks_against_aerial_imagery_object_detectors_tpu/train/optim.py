"""Optimizer: Adam(amsgrad) with exact torch semantics.

The reference optimizes the patch with ``optim.Adam([patch], lr=0.03,
amsgrad=True)`` (train_patch.py:131). torch's amsgrad takes the running
max over the *uncorrected* second moment and applies the bias correction
inside the denominator:

    m <- b1 m + (1-b1) g          v <- b2 v + (1-b2) g^2
    vmax <- max(vmax, v)
    step = lr * (m / (1-b1^t)) / ( sqrt(vmax) / sqrt(1-b2^t) + eps )

``optax.scale_by_amsgrad`` corrects before the max, which drifts from
torch over time — so convergence-curve parity uses this transform
(verified against torch in tests/test_train.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class AmsgradState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates
    nu_max: optax.Updates


def scale_by_torch_amsgrad(b1: float = 0.9, b2: float = 0.999,
                           eps: float = 1e-8) -> optax.GradientTransformation:
    def init_fn(params):
        # three *distinct* zero trees: sharing one would alias buffers and
        # break donation of the optimizer state
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)
        return AmsgradState(
            count=jnp.zeros((), jnp.int32), mu=zeros(), nu=zeros(),
            nu_max=zeros())

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state.nu, updates)
        nu_max = jax.tree.map(jnp.maximum, state.nu_max, nu)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        scaled = jax.tree.map(
            lambda m, vm: (m / bc1) / (jnp.sqrt(vm) / jnp.sqrt(bc2) + eps),
            mu, nu_max)
        return scaled, AmsgradState(count=count, mu=mu, nu=nu,
                                    nu_max=nu_max)

    return optax.GradientTransformation(init_fn, update_fn)
