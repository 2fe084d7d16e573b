#!/usr/bin/env python
"""Full-scale stability soak: N patch-optimization steps on the real
608^2 victim graph with the production defaults (bf16 detector + bf16
EOT warp + fused stem + scatter-free extraction), checking that the
loss decays, every component stays finite, and the patch stays in
[0, 1]. The round-1 soak record (ROADMAP.md) was 2000 steps at f32
warp; rerun after numerics-affecting changes.

Usage: python tools/soak.py [steps] [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu import train as T
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.models import (
    build_network, fold_bn, init_params, yolov3_blocks)
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.utils.cache import (
    enable_compile_cache)

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def main():
    enable_compile_cache()
    exp = T.ExperimentConfig(name="soak", img_size=608, patch_size=224,
                             batch_size=BATCH, max_labels=252,
                             compute_dtype="bfloat16")
    net = build_network(yolov3_blocks())
    params = fold_bn(net, init_params(net, jax.random.PRNGKey(1)))
    step = T.make_train_step(net, exp)
    state = T.init_train_state(exp, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((BATCH, 608, 608, 3), np.float32))
    labels = np.full((BATCH, 252, 5), 1e-6, np.float32)
    labels[:, 0] = [0, 0.5, 0.5, 0.1, 0.15]
    labels = jnp.asarray(labels)
    lr = jnp.float32(0.03)

    t0 = time.perf_counter()
    first = None
    for i in range(STEPS):
        state, aux = step(state, params, images, labels, lr)
        if i % 200 == 0 or i == STEPS - 1:
            vals = {k: float(v) for k, v in aux.items()}
            if first is None:
                first = vals["loss"]
            assert all(np.isfinite(v) for v in vals.values()), (i, vals)
            p = np.asarray(state.patch)
            assert p.min() >= 0.0 and p.max() <= 1.0, (
                i, float(p.min()), float(p.max()))
            print(f"step {i}: loss {vals['loss']:.4f} "
                  f"(no_obj {vals['no_obj']:.3f} no_cls {vals['no_cls']:.3f} "
                  f"tv {vals['tv']:.3f}) patch [{p.min():.3f},{p.max():.3f}]",
                  flush=True)
    dt = time.perf_counter() - t0
    last = float(aux["loss"])
    print(f"\nsoak: {STEPS} steps in {dt:.1f}s "
          f"({STEPS / dt * 60:.0f} steps/min incl. host syncs); "
          f"loss {first:.3f} -> {last:.3f}; all finite; patch in [0,1]")
    assert last < first, "loss did not decrease over the soak"


if __name__ == "__main__":
    main()
