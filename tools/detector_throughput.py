#!/usr/bin/env python
"""Detector inference throughput (the serving path).

Reports the device pipeline (forward + decode + top-k prune, input
resident on device, chained) and the end-to-end path including host
transfers + NMS. Under the sandbox's tunneled TPU the host<->device link
is ~25 MB/s, so e2e is transfer-bound there; on directly-attached TPUs
the device number is the serving rate."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu import evals
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.models import (
    build_network, fold_bn, init_params, yolov3_blocks)
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
net = build_network(yolov3_blocks())
params = fold_bn(net, init_params(net, jax.random.PRNGKey(0)))
det = evals.Detector(net, params)
imgs = np.random.rand(B, 608, 608, 3).astype(np.float32)

# device pipeline, input resident, chained inside one jit
dev_imgs = jnp.asarray(imgs)

@jax.jit
def step(params, x):
    vals = det._infer(params, x)   # [B, k, 8]; col 7 = score
    score = vals[..., 7]
    return x + 1e-12 * jnp.mean(score), score

x, s0 = step(det.params, dev_imgs)
float(jnp.sum(s0))
x, s0 = step(det.params, x)
float(jnp.sum(s0))
N = 20
t0 = time.perf_counter()
for _ in range(N):
    x, s0 = step(det.params, x)
float(jnp.sum(s0))
dt = (time.perf_counter() - t0) / N
print(f"device pipeline (fwd+decode+topk): batch {B}: "
      f"{dt*1e3:.1f} ms/batch  {B/dt:.1f} img/s")

det.detect_batch(imgs, 0.4, 0.4)
t0 = time.perf_counter()
for _ in range(5):
    det.detect_batch(imgs, 0.4, 0.4)
dt = (time.perf_counter() - t0) / 5
print(f"end-to-end incl. host I/O + NMS:   batch {B}: "
      f"{dt*1e3:.1f} ms/batch  {B/dt:.1f} img/s")

# fully on-device detection (incl. fixed-size greedy NMS), input resident
d, v, _ = det.detect_batch_device(dev_imgs, 0.4, 0.4)
float(jnp.sum(v))
t0 = time.perf_counter()
for _ in range(10):
    d, v, _ = det.detect_batch_device(dev_imgs, 0.4, 0.4)
float(jnp.sum(v))
dt = (time.perf_counter() - t0) / 10
print(f"full device detect (fwd+decode+NMS): batch {B}: "
      f"{dt*1e3:.1f} ms/batch  {B/dt:.1f} img/s")
