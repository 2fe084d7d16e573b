#!/usr/bin/env python
"""A/B: does the MXU (sheared tensor-product) warp's rotation
approximation cost attack quality vs the exact gather warp?

Trains two patches with identical seeds/data on the crafted
brightness-victim (tests/test_attack_closed_loop.py) with rotation ON
(U(-pi, pi) — the attack-of-record regime where the mxu warp is
approximate), then evaluates creation metrics M1/M2 at conf 0.4 / 0.01
over held-out scenes, pasting each patch through BOTH warp paths (4
cells): quality differences of the *trained patch* are what matter, not
the warp's pixel residual. Records the table for ROADMAP.md.

Usage: python tools/warp_ab.py [steps] [n_eval]
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


def train_patch(net, params, warp_method, imgs, labs):
    exp = T.ExperimentConfig(
        name=f"ab_{warp_method}", img_size=IMG, patch_size=16,
        batch_size=imgs.shape[0], max_labels=8, compute_dtype="float32",
        loss_recipe="untargeted_obj", learning_rate=0.3,
        do_rotate=True, cell_swap_xy=False, warp_method=warp_method)
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

    # held-out eval scenes
    erng = np.random.default_rng(42)
    eval_imgs = jnp.asarray((erng.random((N_EVAL, IMG, IMG, 3)) * 0.4),
                            jnp.float32)
    eval_labs = jnp.asarray(np.tile(
        np.array([[0, 0.5, 0.9, 0.9, 0.9]], np.float32), (N_EVAL, 8, 1)))
    clean = det.detect_batch(np.asarray(eval_imgs), 0.4, 0.4)
    clean001 = det.detect_batch(np.asarray(eval_imgs), 0.01, 0.4)
    print(f"clean dets @0.4: {sum(len(d) for d in clean)}, "
          f"@0.01: {sum(len(d) for d in clean001)}", flush=True)

    patches = {}
    for wm in ("mxu", "gather"):
        patches[wm], loss = train_patch(net, params, wm, imgs, labs)
        print(f"trained[{wm}]: final loss {loss:.4f} "
              f"mean {float(jnp.mean(patches[wm])):.3f}", flush=True)

    print("\ntrain-warp  paste-warp  M1@0.4  M2@0.4  M1@0.01  M2@0.01")
    for wm, patch in patches.items():
        for paste in ("mxu", "gather"):
            eot = attack.EOTConfig(img_size=IMG, do_rotate=True,
                                   warp_method=paste)
            patched, _ = attack.apply_eot_patch(
                patch, eval_imgs, eval_labs, jax.random.PRNGKey(5), eot)
            row = []
            for conf, cl in ((0.4, clean), (0.01, clean001)):
                pre = det.detect_batch(np.asarray(patched), conf, 0.4)
                m1 = evals.m1_average_instances_created(
                    pre, cl, n_images=N_EVAL)
                m2 = evals.m2_average_confidence_created(pre, cl)
                row += [m1, m2]
            print(f"{wm:10s}  {paste:10s}  "
                  + "  ".join(f"{v:6.3f}" if v == v else "   nan"
                              for v in row), flush=True)


if __name__ == "__main__":
    main()
