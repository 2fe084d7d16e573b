"""Closed-loop attack validation on a hand-crafted victim.

External yolov3-dota weights are not available, so we craft a tiny
victim whose objectness is a calibrated function of local brightness
(identity-on-channel-0 backbone + calibrated head). That makes the
whole claim of the framework testable end to end with *meaningful*
detections:

1. the crafted detector finds a bright square on a dark scene and finds
   nothing on dark scenes (detection path sanity);
2. optimizing the creation objective through the full EOT + detector
   stack brightens the patch until pasted scenes yield detections the
   clean scenes don't — M1 (average instances created) goes positive.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # >60s on one CPU core

from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu import (
    attack, evals, train as T)
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.models import (
    apply, build_network, conv_specs, tiny_test_blocks)

IMG = 64


def craft_brightness_victim():
    """Victim params (folded {w, b} form): channel 0 carries local
    brightness through the backbone (center-tap identity kernels), and
    each head's objectness is a per-scale linear map of that feature,
    calibrated so brightness 0.5 -> logit -6 and 0.9 -> logit +3.
    Class 3 has a constant +2 logit so obj*cls crosses thresholds."""
    net = build_network(tiny_test_blocks(width=IMG, height=IMG))
    params = {}
    for spec in conv_specs(net):
        w = np.zeros((spec.size, spec.size, spec.in_ch, spec.filters),
                     np.float32)
        c = spec.size // 2
        w[c, c, 0, 0] = 1.0      # pass channel 0 through
        params[f"conv_{spec.index}"] = {
            "w": jnp.asarray(w),
            "b": jnp.zeros((spec.filters,), jnp.float32),
        }

    # calibrate each head: read the channel-0 feature under constant
    # brightness (head conv currently copies feature ch0 into out ch0)
    def feature_at_heads(v):
        x = jnp.full((1, IMG, IMG, 3), v, jnp.float32)
        heads = apply(net, params, x)
        return [float(h[0, 0, 0, 0]) for h in heads]

    f_lo = feature_at_heads(0.2)
    f_hi = feature_at_heads(0.9)
    head_specs = [s for s in conv_specs(net) if s.filters == 60]
    for spec, lo, hi in zip(head_specs, f_lo, f_hi):
        alpha = 9.0 / (hi - lo)
        beta = 3.0 - alpha * hi
        w = np.zeros((1, 1, spec.in_ch, 60), np.float32)
        b = np.zeros((60,), np.float32)
        for a in range(3):
            w[0, 0, 0, 20 * a + 4] = alpha        # obj logit
            b[20 * a + 4] = beta
            b[20 * a + 5 + 3] = 2.0               # class 3 logit
            b[20 * a + 5:20 * a + 20] += np.where(
                np.arange(15) == 3, 0.0, -4.0)    # other classes low
        params[f"conv_{spec.index}"] = {"w": jnp.asarray(w),
                                        "b": jnp.asarray(b)}
    return net, params


@pytest.fixture(scope="module")
def victim():
    return craft_brightness_victim()


def _dark_scene(rng, n=1):
    return (rng.random((n, IMG, IMG, 3)) * 0.4).astype(np.float32)


def test_crafted_victim_detects_brightness(victim):
    net, params = victim
    det = evals.Detector(net, params, img_size=IMG,
                         compute_dtype=jnp.float32, max_candidates=256)
    rng = np.random.default_rng(0)
    dark = _dark_scene(rng)[0]
    assert len(det.detect(dark, 0.4, 0.4)) == 0
    bright = dark.copy()
    bright[24:40, 24:40, :] = 0.95
    dets = bright_dets = det.detect(bright, 0.4, 0.4)
    assert len(bright_dets) >= 1
    # the detection sits on the bright square
    assert abs(dets[0][0] - 0.5) < 0.3 and abs(dets[0][1] - 0.5) < 0.3
    assert dets[0][6] == 3  # crafted class


def test_patch_training_creates_detections(victim):
    """The paper's claim, end to end: train the patch with the creation
    objective, paste it, and the victim hallucinates objects that the
    clean scenes don't contain (M1 > 0)."""
    net, params = victim
    exp = T.ExperimentConfig(
        name="closedloop", img_size=IMG, patch_size=16, batch_size=8,
        max_labels=8, compute_dtype="float32",
        loss_recipe="untargeted_obj", learning_rate=0.3,
        do_rotate=False, cell_swap_xy=False)
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(_dark_scene(rng, 8))
    # all rows real (no 1e-6 padding): the reference-box average stays a
    # big box, so the warped patch (~40 px) reliably covers the sampled
    # cells at every scale
    labs = jnp.asarray(np.tile(
        np.array([[0, 0.5, 0.9, 0.9, 0.9]], np.float32), (8, 8, 1)))

    step = T.make_train_step(net, exp)
    state = T.init_train_state(exp, jax.random.PRNGKey(0))
    for _ in range(600):
        state, aux = step(state, params, imgs, labs, jnp.float32(0.3))
    patch = state.patch
    # (single-step aux is noisy — random placement can miss the sampled
    # cell; the M1 check below is the meaningful assertion)
    assert float(jnp.mean(patch)) > 0.6  # learned to brighten

    # evaluate: clean vs patched detections over the batch
    det = evals.Detector(net, params, img_size=IMG,
                         compute_dtype=jnp.float32, max_candidates=256)
    clean_dets = det.detect_batch(np.asarray(imgs), 0.4, 0.4)
    eot = attack.EOTConfig(img_size=IMG, do_rotate=False)
    patched, _ = attack.apply_eot_patch(patch, imgs, labs,
                                        jax.random.PRNGKey(5), eot)
    pre_dets = det.detect_batch(np.asarray(patched), 0.4, 0.4)

    m1 = evals.m1_average_instances_created(pre_dets, clean_dets,
                                            n_images=8)
    assert sum(len(d) for d in clean_dets) == 0
    assert m1 > 0.5, f"M1={m1}: the patch should create detections"


def test_pgd_fabrication_creates_detections(victim):
    """The completed TOG-style per-image fabrication attack (the
    reference's was abandoned): eps-bounded PGD raises fabrication on
    the crafted victim — perturbed dark scenes yield detections."""
    net, params = victim
    cfg = attack.PGDConfig(eps=0.4, alpha=0.08, steps=12)
    pgd = attack.make_pgd_fabrication(net, cfg)
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(_dark_scene(rng, 4))
    adv = pgd(params, imgs)
    a = np.asarray(adv)
    assert np.abs(a - np.asarray(imgs)).max() <= cfg.eps + 1e-6
    assert (a >= 0).all() and (a <= 1).all()

    det = evals.Detector(net, params, img_size=IMG,
                         compute_dtype=jnp.float32, max_candidates=256)
    clean = det.detect_batch(np.asarray(imgs), 0.4, 0.4)
    fabricated = det.detect_batch(a, 0.4, 0.4)
    assert sum(len(d) for d in clean) == 0
    assert sum(len(d) for d in fabricated) >= 4
