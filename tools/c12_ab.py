#!/usr/bin/env python
"""Numerics + step-time A/B of the conv12-widened fused front
(ADV_PATCH_RES152=c12) vs the default path. One mode per invocation so
the persistent compile cache survives timeouts:

    python tools/c12_ab.py grad [c12]   # loss+grad digest at b2 608^2
    python tools/c12_ab.py step B [c12] # train-step ms at batch B
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

mode = sys.argv[1]
if sys.argv[-1] == "c12":
    os.environ["ADV_PATCH_RES152"] = "c12"

import jax
import jax.numpy as jnp
import numpy as np

from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.utils.cache import (
    enable_compile_cache)

enable_compile_cache()

from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.models import (
    apply, build_network, fold_bn, init_params, yolov3_blocks)
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.models import (
    darknet as _darknet)

net = build_network(yolov3_blocks())
params = fold_bn(net, init_params(net, jax.random.PRNGKey(1)))


def check_route():
    """Refuse to report a number under the c12 label if any dispatch
    gate silently fell back to another route (models/darknet.py
    last_routes breadcrumb; call right after the step has traced)."""
    if os.environ.get("ADV_PATCH_RES152") == "c12":
        routes = _darknet.last_routes()
        if routes != {"stem": "c12", "res152": "c12"}:
            sys.exit(f"c12 requested but the trace took {routes} — a "
                     f"gate fell back; this timing must not be "
                     f"reported as c12")

if mode == "grad":
    x = jnp.asarray(np.random.default_rng(0).random((2, 608, 608, 3),
                                                    np.float32))

    def f(xx):
        heads = apply(net, params, xx, compute_dtype=jnp.bfloat16)
        return sum(jnp.sum(h.astype(jnp.float32) ** 2) for h in heads)

    val, grad = jax.jit(jax.value_and_grad(f))(x)
    check_route()
    g = np.asarray(grad)
    print(f"loss={float(val):.6e} gsum={g.sum():.6e} "
          f"gmax={np.abs(g).max():.6e} gnorm={np.linalg.norm(g):.6e}")
else:
    import time
    from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu import train as T
    from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.parallel.mesh import (
        batch_sharding, make_mesh, replicated)
    B = int(sys.argv[2])
    mesh = make_mesh()
    exp = T.ExperimentConfig(name="ab", img_size=608, patch_size=224,
                             batch_size=B, compute_dtype="bfloat16")
    p = jax.device_put(params, replicated(mesh))
    state = jax.device_put(T.init_train_state(exp, jax.random.PRNGKey(0)),
                           replicated(mesh))
    step = T.make_train_step(net, exp, mesh=mesh)
    imgs = jax.device_put(
        np.random.rand(B, 608, 608, 3).astype(np.float32),
        batch_sharding(mesh))
    labs = jax.device_put(np.full((B, 252, 5), 1e-6, np.float32),
                          batch_sharding(mesh))
    lr = jnp.float32(0.03)
    for _ in range(3):
        state, aux = step(state, p, imgs, labs, lr)
    check_route()
    np.asarray(aux["loss"])
    N = 30
    t0 = time.perf_counter()
    for _ in range(N):
        state, aux = step(state, p, imgs, labs, lr)
    jax.block_until_ready(state.patch)
    dt = (time.perf_counter() - t0) / N
    print(f"batch {B}: {dt * 1e3:.2f} ms/step "
          f"({60.0 / dt:.0f} steps/min, loss {float(aux['loss']):.4f})")
