#!/usr/bin/env python
"""Paste a trained patch onto images and save the composites
(the working equivalent of the reference's broken patch_applier.py
script): train-mode EOT placement (random center/rotation/scale drawn
from per-image labels) or a fixed center/scale via flags."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu import attack
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.data.dataset import (
    load_image_rgb, pad_and_scale)
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.data.labels import (
    pad_labels, read_label_file)
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.utils.checkpoint import load_patch_png


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--patch", required=True)
    ap.add_argument("--patch-size", type=int, default=224)
    ap.add_argument("--img-dir", required=True)
    ap.add_argument("--lab-dir", default=None,
                    help="5-col labels driving EOT scale (omit for fixed)")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--img-size", type=int, default=608)
    ap.add_argument("--fixed-center", type=float, nargs=2, default=None,
                    metavar=("X", "Y"),
                    help="normalized center; disables random placement")
    ap.add_argument("--fixed-scale", type=float, default=0.5)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    patch = jnp.asarray(load_patch_png(args.patch, args.patch_size))
    os.makedirs(args.out_dir, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)
    cfg = attack.EOTConfig(img_size=args.img_size)

    files = sorted(f for f in os.listdir(args.img_dir)
                   if f.lower().endswith((".png", ".jpg")))
    for name in files:
        stem = os.path.splitext(name)[0]
        img = load_image_rgb(os.path.join(args.img_dir, name))
        arr, _ = pad_and_scale(img, np.zeros((0, 5), np.float32),
                               args.img_size)
        if args.fixed_center is not None:
            x, y = args.fixed_center
            smoothed = jnp.clip(patch, 0, 1)[None]
            adv, _ = attack.warp_patch(
                smoothed, jnp.zeros(1),
                jnp.asarray([args.fixed_scale], jnp.float32),
                jnp.asarray([x], jnp.float32),
                jnp.asarray([y], jnp.float32), args.img_size)
        else:
            labels = np.zeros((0, 5), np.float32)
            if args.lab_dir:
                labels = read_label_file(
                    os.path.join(args.lab_dir, stem + ".txt"), 5)
            labels = pad_labels(labels, max(len(labels), 1))[None]
            key, sub = jax.random.split(key)
            adv, _, _ = attack.transform_patch(
                patch, jnp.asarray(labels), sub, cfg)
        out = np.asarray(attack.paste_patch(jnp.asarray(arr)[None], adv))[0]
        Image.fromarray((out * 255).astype(np.uint8)).save(
            os.path.join(args.out_dir, stem + ".png"))
    print(f"pasted onto {len(files)} images -> {args.out_dir}")


if __name__ == "__main__":
    main()
