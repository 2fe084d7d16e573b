#!/usr/bin/env python
"""A/B: does running the EOT warp + composite in bfloat16 cost attack
quality vs the reference-width float32 path?

Same harness as tools/warp_ab.py (crafted brightness victim, identical
seeds/data, rotation ON), but the axis under test is
``ExperimentConfig.warp_dtype`` — the detector compute dtype is pinned
to float32 in BOTH runs so the only thing that changes is the dtype of
the warp matmuls / canvas temps / composite. Both trained patches are
evaluated through the exact float32 paste path. Records the table for
ROADMAP.md.

Usage: python tools/warp_dtype_ab.py [steps] [n_eval]
"""
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import jax
import jax.numpy as jnp
import numpy as np

from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu import (
    attack, evals, train as T)
from test_attack_closed_loop import craft_brightness_victim

IMG = 64
STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 600
N_EVAL = int(sys.argv[2]) if len(sys.argv) > 2 else 64


def train_patch(net, params, warp_dtype, imgs, labs):
    exp = T.ExperimentConfig(
        name=f"ab_{warp_dtype}", img_size=IMG, patch_size=16,
        batch_size=imgs.shape[0], max_labels=8, compute_dtype="float32",
        loss_recipe="untargeted_obj", learning_rate=0.3,
        do_rotate=True, cell_swap_xy=False, warp_dtype=warp_dtype)
    step = T.make_train_step(net, exp)
    state = T.init_train_state(exp, jax.random.PRNGKey(0))
    for _ in range(STEPS):
        state, aux = step(state, params, imgs, labs, jnp.float32(0.3))
    return state.patch, float(aux["loss"])


def main():
    net, params = craft_brightness_victim()
    rng = np.random.default_rng(1)
    imgs = jnp.asarray((rng.random((8, IMG, IMG, 3)) * 0.4), jnp.float32)
    labs = jnp.asarray(np.tile(
        np.array([[0, 0.5, 0.9, 0.9, 0.9]], np.float32), (8, 8, 1)))

    det = evals.Detector(net, params, img_size=IMG,
                         compute_dtype=jnp.float32, max_candidates=256)

    erng = np.random.default_rng(42)
    eval_imgs = jnp.asarray((erng.random((N_EVAL, IMG, IMG, 3)) * 0.4),
                            jnp.float32)
    eval_labs = jnp.asarray(np.tile(
        np.array([[0, 0.5, 0.9, 0.9, 0.9]], np.float32), (N_EVAL, 8, 1)))
    clean = det.detect_batch(np.asarray(eval_imgs), 0.4, 0.4)
    clean001 = det.detect_batch(np.asarray(eval_imgs), 0.01, 0.4)
    print(f"clean dets @0.4: {sum(len(d) for d in clean)}, "
          f"@0.01: {sum(len(d) for d in clean001)}", flush=True)

    print("\nwarp-dtype  final-loss  M1@0.4  M2@0.4  M1@0.01  M2@0.01")
    for wd in ("float32", "bfloat16"):
        patch, loss = train_patch(net, params, wd, imgs, labs)
        # exact float32 paste for BOTH (the eval protocol of record)
        eot = attack.EOTConfig(img_size=IMG, do_rotate=True)
        patched, _ = attack.apply_eot_patch(
            patch, eval_imgs, eval_labs, jax.random.PRNGKey(5), eot)
        row = []
        for conf, cl in ((0.4, clean), (0.01, clean001)):
            pre = det.detect_batch(np.asarray(patched), conf, 0.4)
            m1 = evals.m1_average_instances_created(
                pre, cl, n_images=N_EVAL)
            m2 = evals.m2_average_confidence_created(pre, cl)
            row += [m1, m2]
        print(f"{wd:10s}  {loss:10.4f}  "
              + "  ".join(f"{v:6.3f}" if v == v else "   nan"
                          for v in row), flush=True)


if __name__ == "__main__":
    main()
