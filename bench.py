"""Benchmark: patch-optimization steps/min on the flagship pipeline.

Measures the full jitted train step (EOT transform + composite + YOLOv3
forward/backward through all 75 convs + creation losses + amsgrad update)
at batch 8, 608x608, bfloat16 detector compute, on whatever devices are
visible (one v5e chip under the driver).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is the image-throughput ratio vs. the reference's logged
V100S run (~0.8 steps/s at batch 24 => 19.2 img/s; BASELINE.md).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu import train as T
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.utils.cache import enable_compile_cache
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.models import (
    build_network, fold_bn, init_params, yolov3_blocks)
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.parallel.mesh import (
    batch_sharding, make_mesh, replicated)

BATCH = 8
IMG = 608
REFERENCE_IMG_PER_S = 19.2  # V100S, batch 24, ~0.8 steps/s (BASELINE.md)


def main():
    enable_compile_cache()
    mesh = make_mesh()
    n_dev = mesh.devices.size
    exp = T.ExperimentConfig(
        name="bench", img_size=IMG, patch_size=224, batch_size=BATCH,
        max_labels=252, compute_dtype="bfloat16")
    net = build_network(yolov3_blocks())
    params = fold_bn(net, init_params(net, jax.random.PRNGKey(1)))

    rep = replicated(mesh)
    data = batch_sharding(mesh)
    params = jax.device_put(params, rep)
    state = jax.device_put(T.init_train_state(exp, jax.random.PRNGKey(0)),
                           rep)
    step = T.make_train_step(net, exp, mesh=mesh)

    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.random((BATCH, IMG, IMG, 3), np.float32), data)
    labels = np.full((BATCH, 252, 5), 1e-6, np.float32)
    labels[:, 0] = [0, 0.5, 0.5, 0.1, 0.15]
    labels = jax.device_put(labels, data)
    lr = jnp.float32(0.03)

    # warmup / compile. Safety net: if the Pallas fast paths fail to
    # compile on this backend (e.g. a Mosaic/libtpu version skew), fall
    # back to the pure-XLA step rather than reporting nothing.
    try:
        for _ in range(3):
            state, aux = step(state, params, images, labels, lr)
        jax.block_until_ready(state.patch)
    except Exception as e:  # noqa: BLE001
        print(f"# fused-kernel path failed ({type(e).__name__}); "
              f"falling back to the XLA stem", flush=True)
        os.environ["ADV_PATCH_FUSED_STEM"] = "0"
        os.environ["ADV_PATCH_MXU_LAYOUT"] = "0"
        state = jax.device_put(
            T.init_train_state(exp, jax.random.PRNGKey(0)), rep)
        step = T.make_train_step(net, exp, mesh=mesh)
        for _ in range(3):
            state, aux = step(state, params, images, labels, lr)
        jax.block_until_ready(state.patch)

    n_steps = 30
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, aux = step(state, params, images, labels, lr)
    jax.block_until_ready(state.patch)
    dt = time.perf_counter() - t0

    steps_per_min = n_steps / dt * 60.0
    img_per_s = n_steps * BATCH / dt
    print(json.dumps({
        "metric": f"patch_train_steps_per_min_b{BATCH}_{n_dev}dev",
        "value": round(steps_per_min, 2),
        "unit": "steps/min",
        "vs_baseline": round(img_per_s / REFERENCE_IMG_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
