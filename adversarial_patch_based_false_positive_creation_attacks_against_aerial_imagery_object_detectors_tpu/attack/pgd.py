"""Per-image PGD fabrication attack (a working TOG-style attack).

The reference ships an *abandoned* TOG fabrication script
(TOG_attack.py — undefined loss at :46, flagged "on hold"): an
L-inf-bounded per-image perturbation (not a patch) that makes the
detector fabricate objects everywhere. This is the completed,
TPU-native version: one jitted ``lax.fori_loop`` of sign-gradient steps
with an eps-ball projection, maximizing summed objectness over every
anchor (the standard fabrication objective), batched over images.

    x_{t+1} = clip_eps( x_t + alpha * sign( d/dx sum sigmoid(obj) ) )
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from ..models import darknet


@dataclasses.dataclass(frozen=True)
class PGDConfig:
    eps: float = 8.0 / 255.0       # L-inf budget
    alpha: float = 2.0 / 255.0     # step size
    steps: int = 10
    targeted_class: int | None = None   # also push one class's score up


def fabrication_loss(heads: Sequence[jnp.ndarray], num_classes: int = 15,
                     targeted_class: int | None = None) -> jnp.ndarray:
    """Mean sigmoid objectness over every anchor of every scale (plus
    the targeted class's mean score when requested) — maximized."""
    total = 0.0
    count = 0
    for head in heads:
        b, s, _, _ = head.shape
        x = head.reshape(b, s, s, 3, 5 + num_classes)
        total = total + jnp.sum(jax.nn.sigmoid(x[..., 4]))
        if targeted_class is not None:
            total = total + jnp.sum(jax.nn.sigmoid(
                x[..., 5 + targeted_class]))
        count += x[..., 4].size
    return total / count


def make_pgd_fabrication(net: darknet.Network, cfg: PGDConfig = PGDConfig(),
                         num_classes: int = 15,
                         compute_dtype=jnp.float32):
    """Build the jitted attack: (params, images [B,S,S,3] in [0,1]) ->
    adversarial images (same shape, within eps and [0,1])."""

    def loss_fn(x, params):
        heads = darknet.apply(net, params, x, compute_dtype)
        return fabrication_loss(heads, num_classes, cfg.targeted_class)

    grad_fn = jax.grad(loss_fn)

    @jax.jit
    def attack(params, images):
        lo = jnp.clip(images - cfg.eps, 0.0, 1.0)
        hi = jnp.clip(images + cfg.eps, 0.0, 1.0)

        def body(_, x):
            g = grad_fn(x, params)
            return jnp.clip(x + cfg.alpha * jnp.sign(g), lo, hi)

        return jax.lax.fori_loop(0, cfg.steps, body, images)

    return attack
