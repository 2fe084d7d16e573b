#!/usr/bin/env python
"""Attack train/test-set construction (reference images_filter.py).

Runs the victim over raw DOTA 608-tiles at conf 0.01; keeps images with
at least one detection; writes the image plus two label dirs:
5-col pseudo-GT (``cls x y w h``) for detections with obj > --gt-conf,
and 7-col w_conf labels for all detections — i.e. ground truth is the
victim's own pseudo-labels, at two thresholds, matching the reference's
data protocol (images_filter.py:99-124).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image

from common import add_model_args, build_detector
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.data.dataset import (
    load_image_rgb, pad_and_scale)
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.data.labels import write_label_file
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.evals import detections_to_label_rows


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    add_model_args(ap)
    ap.add_argument("--img-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--conf", type=float, default=0.01)
    ap.add_argument("--gt-conf", type=float, default=0.4)
    ap.add_argument("--nms", type=float, default=0.4)
    ap.add_argument("--batch-size", type=int, default=8)
    args = ap.parse_args(argv)

    det = build_detector(args)
    img_out = os.path.join(args.out_dir, "images")
    lab_out = os.path.join(args.out_dir, "yolo-labels")
    lab_conf_out = os.path.join(args.out_dir, "yolo-labels_w_conf")
    for d in (img_out, lab_out, lab_conf_out):
        os.makedirs(d, exist_ok=True)

    files = sorted(f for f in os.listdir(args.img_dir)
                   if f.lower().endswith((".png", ".jpg")))
    kept = 0
    for i in range(0, len(files), args.batch_size):
        chunk = files[i:i + args.batch_size]
        arrs = []
        for name in chunk:
            img = load_image_rgb(os.path.join(args.img_dir, name))
            arr, _ = pad_and_scale(img, np.zeros((0, 5), np.float32),
                                   args.img_size)
            arrs.append(arr)
        dets = det.detect_batch(np.stack(arrs), args.conf, args.nms)
        for name, arr, d in zip(chunk, arrs, dets):
            if len(d) == 0:
                continue
            kept += 1
            stem = os.path.splitext(name)[0]
            Image.fromarray((arr * 255).astype(np.uint8)).save(
                os.path.join(img_out, stem + ".png"))
            strong = d[d[:, 4] > args.gt_conf]
            write_label_file(os.path.join(lab_out, stem + ".txt"),
                             detections_to_label_rows(strong, False))
            write_label_file(os.path.join(lab_conf_out, stem + ".txt"), d)
    print(f"kept {kept}/{len(files)} images with >=1 detection")


if __name__ == "__main__":
    main()
