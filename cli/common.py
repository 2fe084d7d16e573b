"""Shared CLI plumbing: argument groups and victim-detector construction.

Replaces the reference's edit-the-file configuration (paths hardcoded at
the top of each script) with flags."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu import evals
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.models import (
    build_network, fold_bn, init_params, load_darknet_weights,
    network_from_cfg, yolov3_blocks)


def add_model_args(parser: argparse.ArgumentParser) -> None:
    g = parser.add_argument_group("victim detector")
    g.add_argument("--cfgfile", default=None,
                   help="darknet .cfg (default: built-in yolov3-dota)")
    g.add_argument("--weightfile", default=None,
                   help="darknet .weights (default: random init)")
    g.add_argument("--img-size", type=int, default=608)
    g.add_argument("--num-classes", type=int, default=15)
    g.add_argument("--fp32", action="store_true",
                   help="run the detector in float32 instead of bfloat16")


def build_detector(args) -> evals.Detector:
    if args.cfgfile:
        net = network_from_cfg(args.cfgfile)
    else:
        net = build_network(yolov3_blocks(
            num_classes=args.num_classes, width=args.img_size,
            height=args.img_size))
    if args.weightfile:
        params, _ = load_darknet_weights(net, args.weightfile)
    else:
        print("WARNING: no --weightfile given; using random-init weights "
              "(detections will be meaningless)", flush=True)
        params = init_params(net, jax.random.PRNGKey(0))
    params = fold_bn(net, params)
    return evals.Detector(
        net, params, img_size=args.img_size,
        num_classes=args.num_classes,
        compute_dtype=jnp.float32 if args.fp32 else jnp.bfloat16)
