#!/usr/bin/env python
"""Convergence-curve comparison against the reference's committed
training log, replicated at mini scale.

The reference's only quantitative training record is
``training_patches_saves/training_logs/training_test_log.log`` (V100S,
mode paper_obj, batch 24), whose epoch-0 mean loss decomposition is
pinned in BASELINE.md:

    total 7.139 | no_obj 3.964 | no_cls 2.684 | tv 0.356
    colorful 0.134 | nps 4.5e-4

Those numbers are conditioned on the DOTA-trained
``yolov3-dota_110000.weights`` checkpoint and the 2410-tile DOTA
trainset, neither of which exists in the repo or is reachable offline
(SURVEY.md §0). What CAN be replicated is the experimental *protocol*,
end to end, on the torch-trained mini victim from the refparity
fixture (tests/fixtures/refparity/, trained deterministically by the
reference implementation on synthetic box scenes):

1. synthesize scenes from the victim's training distribution,
2. pseudo-label them with the victim itself at conf 0.01 / GT at
   obj>0.4 (the images_filter protocol, reference images_filter.py:
   112-124),
3. optimize a patch with the paper_obj recipe (batch 24, lr 0.03,
   Adam-amsgrad, TV 2.5 / NPS 0.01 / target 14 — the hyperparameters
   of record) and log the same per-epoch loss decomposition.

The printed table puts the mini-scale trajectory next to the
reference's anchors. Patch-intrinsic components (nps, tv, colorful)
are victim-independent and should land near the reference's; the
victim-coupled components (no_obj, no_cls) share scale by
construction (no_obj <= 4 by definition, no_cls is CE over 15
classes) but depend on the detector's statistics.

``--full`` runs the same protocol on the ARCHITECTURE OF RECORD — the
full-scale refparity victim (75-conv yolov3-dota graph, 608^2 tiles,
patch 224, the reference's exact input/patch geometry) from
tests/fixtures/refparity_full (regenerate with
``tools/make_refparity_fixture.py --full`` if absent).

Usage: python tools/convergence_compare.py [epochs] [n_scenes] [--full]
"""

import argparse
import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_ap = argparse.ArgumentParser()
_ap.add_argument("epochs", nargs="?", type=int, default=20)
_ap.add_argument("n_scenes", nargs="?", type=int, default=96)
_ap.add_argument("--full", action="store_true",
                 help="full-scale victim (refparity_full, 608^2, "
                      "patch 224)")
_ARGS = _ap.parse_args()

_FIXROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures")
FIX = os.path.join(_FIXROOT,
                   "refparity_full" if _ARGS.full else "refparity")
VICTIM = "yolov3_dota_synth" if _ARGS.full else "mini_yolov3_dota"

EPOCHS = _ARGS.epochs
N_SCENES = _ARGS.n_scenes
MAX_LAB = 32

REF_EPOCH0 = {"loss": 7.139, "no_obj": 3.964, "no_cls": 2.684,
              "tv": 0.356, "colorful": 0.134, "nps": 4.5e-4}


def _load_fixture_gen():
    spec = importlib.util.spec_from_file_location(
        "make_refparity_fixture",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "make_refparity_fixture.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.evals.detect import Detector
    from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.models import (
        darknet, load_darknet_weights)
    from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.train import (
        PatchTrainer, get_experiment)

    weights_path = os.path.join(FIX, f"{VICTIM}.weights")
    if not os.path.exists(weights_path):
        sys.exit(f"{weights_path} missing — regenerate with "
                 f"tools/make_refparity_fixture.py"
                 f"{' --full' if _ARGS.full else ''}")
    net = darknet.network_from_cfg(os.path.join(FIX, f"{VICTIM}.cfg"))
    params, _ = load_darknet_weights(net, weights_path)
    params = darknet.fold_bn(net, params)
    # the full-scale victim trains at 320^2 but its cfg/goldens/record
    # geometry is 608^2 (fully-convolutional net)
    img = 608 if _ARGS.full else net.width

    # -- victim-pseudo-labeled training set (images_filter protocol)
    gen = _load_fixture_gen()
    rng = np.random.default_rng(42)
    palette = gen._palette(np.random.default_rng(7))
    det = Detector(net, params, img_size=img)
    images, labels = [], []
    tried = 0
    while len(images) < N_SCENES and tried < 4 * N_SCENES:
        batch = []
        for _ in range(16):
            scene, _ = gen.make_scene(rng, palette, img=img)
            batch.append(scene.astype(np.float32) / 255.0)
            tried += 1
        dets = det.detect_batch(np.stack(batch), 0.01, 0.4)
        for scene, d in zip(batch, dets):
            if len(d) == 0:
                continue                      # images_filter: drop
            gt = d[d[:, 4] > 0.4]
            lab = np.full((MAX_LAB, 5), 1e-6, np.float32)
            if len(gt) == 0:
                lab[0] = 1.0                  # empty-label sentinel
            else:
                gt = gt[:MAX_LAB]
                lab[:len(gt), 0] = gt[:, 6]
                lab[:len(gt), 1:5] = gt[:, 0:4]
            images.append(scene)
            labels.append(lab)
    images = np.stack(images[:N_SCENES])
    labels = np.stack(labels[:N_SCENES])
    print(f"trainset: {len(images)} scenes "
          f"({(labels[:, :, 0] != 1e-6).sum()} pseudo-label rows), "
          f"victim={os.path.basename(FIX)} @ {img}^2", flush=True)

    # patch 224 @ 608^2 is the reference's geometry of record
    # (patch_config.py:23); the mini victim scales both by ~half
    exp = get_experiment(
        "paper_obj", img_size=img,
        patch_size=224 if _ARGS.full else 112, max_labels=MAX_LAB,
        compute_dtype="bfloat16", max_epochs=EPOCHS)
    trainer = PatchTrainer(exp, net=net, params=params, seed=0)

    bsz = exp.batch_size
    n_batches = max(1, len(images) // bsz)

    def make_batches(epoch):
        order = np.random.default_rng(1000 + epoch).permutation(
            len(images))
        for i in range(n_batches):
            sel = order[i * bsz:(i + 1) * bsz]
            yield images[sel], labels[sel]

    _, history = trainer.train(make_batches, epochs=EPOCHS)

    cols = ("loss", "no_obj", "no_cls", "tv", "colorful", "nps")
    print("\n| epoch | " + " | ".join(cols) + " |")
    print("|" + "---|" * (len(cols) + 1))
    ref = REF_EPOCH0
    print("| ref ep0 (DOTA victim) | "
          + " | ".join(f"{ref[c]:.3g}" for c in cols) + " |")
    for st in history:
        if st["epoch"] % max(1, EPOCHS // 10) and st["epoch"] != EPOCHS - 1:
            continue
        print(f"| {st['epoch']} | "
              + " | ".join(f"{st[c]:.3g}" for c in cols) + " |")
    scale = "full" if _ARGS.full else "mini"
    out = {"reference_epoch0": ref,
           scale: [{k: st[k] for k in cols + ("epoch",)}
                   for st in history]}
    path = f"/tmp/convergence_compare_{scale}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nwrote {path}")


if __name__ == "__main__":
    main()
