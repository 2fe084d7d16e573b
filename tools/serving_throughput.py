#!/usr/bin/env python
"""Serving-path load test: sustained throughput of the micro-batching
DetectionService (evals/serving.py) under concurrent request pressure,
bypassing HTTP (in-process callers) so the number reflects the
batcher + device pipeline, not socket overhead.

Under the sandbox's relay TPU the host<->device result fetch dominates
per-batch latency; on directly-attached TPUs the ceiling is the
detect_batch_device rate (tools/detector_throughput.py).

Usage: python tools/serving_throughput.py [n_requests] [max_batch] [n_clients] [wire_dtype]
(wire_dtype: float32 | uint8 — uint8 ships 4x less host->device)
"""
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu import evals
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.evals.serving import DetectionService
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.models import (
    build_network, fold_bn, init_params, yolov3_blocks)
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

N_REQ = int(sys.argv[1]) if len(sys.argv) > 1 else 64
MAX_B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
CLIENTS = int(sys.argv[3]) if len(sys.argv) > 3 else 16
WIRE = np.dtype(sys.argv[4]) if len(sys.argv) > 4 else np.dtype(np.float32)


def main():
    net = build_network(yolov3_blocks())
    params = fold_bn(net, init_params(net, jax.random.PRNGKey(0)))
    det = evals.Detector(net, params)
    svc = DetectionService(det, max_batch=MAX_B, window_ms=10.0,
                           conf_thresh=0.4, nms_thresh=0.4, wire_dtype=WIRE)
    rng = np.random.default_rng(0)
    if WIRE == np.uint8:
        imgs = [rng.integers(0, 256, (608, 608, 3), dtype=np.uint8)
                for _ in range(min(N_REQ, 8))]
    else:
        imgs = [rng.random((608, 608, 3)).astype(np.float32)
                for _ in range(min(N_REQ, 8))]
    with svc:
        # warm the pool + service once
        svc.submit(imgs[0])
        t0 = time.perf_counter()
        with ThreadPoolExecutor(CLIENTS) as pool:
            list(pool.map(lambda i: svc.submit(imgs[i % len(imgs)]),
                          range(N_REQ)))
        dt = time.perf_counter() - t0
    s = svc.stats
    print(f"served {N_REQ} reqs in {dt:.2f}s = {N_REQ/dt:.1f} img/s "
          f"({s.batches} batches, mean fill {s.mean_batch:.1f}/{MAX_B}, "
          f"{CLIENTS} clients, wire={WIRE.name}, "
          f"devices={jax.device_count()})")


if __name__ == "__main__":
    main()
