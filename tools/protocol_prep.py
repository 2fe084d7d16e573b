#!/usr/bin/env python
"""Build the protocol-scale trainset for tools/protocol_run.py.

Stage 1-2 of the reference protocol at its own scale: synthesize raw
608^2 scenes from the victim's training distribution (reference analog:
the raw DOTA tile pool), then cli/images_filter.py them into the
victim-pseudo-labeled train set + held-out clean ground truth
(reference images_filter.py:40-133 — "ground truth = victim
pseudo-labels"). Split out of tools/attack_quality.py because filtering
thousands of tiles is a long one-time step worth caching between
protocol runs; tools/protocol_run.py consumes the output directories.

Usage:
    python tools/protocol_prep.py --out /root/protocol \
        [--raw-train 2600] [--test-scenes 64] [--seed 0]
"""
import argparse
import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXROOT = os.path.join(REPO, "tests", "fixtures")
sys.path.insert(0, os.path.join(REPO, "tools"))

from attack_quality import _gen_scenes, _load_fixture_gen, _run_cli


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--raw-train", type=int, default=2600,
                    help="raw scenes synthesized; images_filter keeps "
                         "those with >=1 conf-0.01 detection (need "
                         ">=2,410 survivors, the count of record)")
    ap.add_argument("--test-scenes", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--img-size", type=int, default=None)
    ap.add_argument("--mini", action="store_true",
                    help="use the committed mini victim @320^2 — a "
                         "fast dress rehearsal of the orchestration, "
                         "not the protocol of record")
    args = ap.parse_args()

    if args.mini:
        fix = os.path.join(FIXROOT, "refparity")
        cfg = os.path.join(fix, "mini_yolov3_dota.cfg")
        weights = os.path.join(fix, "mini_yolov3_dota.weights")
        args.img_size = args.img_size or 320
    else:
        fix = os.path.join(FIXROOT, "refparity_full")
        cfg = os.path.join(fix, "yolov3_dota_synth.cfg")
        weights = os.path.join(fix, "yolov3_dota_synth.weights")
        args.img_size = args.img_size or 608
    if not os.path.exists(weights):
        sys.exit(f"{weights} missing — regenerate with make refparity-full")

    os.makedirs(args.out, exist_ok=True)
    log = os.path.join(args.out, "prep.log")
    gen = _load_fixture_gen()

    # distinct RNG streams: train/test disjoint, and both disjoint from
    # the fixture goldens and from attack_quality's 2024/4048 defaults
    # (a protocol run must not share scenes with the quality-check runs)
    print(f"[1/2] synthesizing {args.raw_train} train + "
          f"{args.test_scenes} test scenes @ {args.img_size}^2", flush=True)
    _gen_scenes(gen, os.path.join(args.out, "raw_train"), args.raw_train,
                90210 + args.seed, args.img_size)
    _gen_scenes(gen, os.path.join(args.out, "raw_test"), args.test_scenes,
                31337 + args.seed, args.img_size)

    model_args = ["--cfgfile", cfg, "--weightfile", weights,
                  "--img-size", args.img_size]
    print("[2/2] images_filter (victim pseudo-labels)", flush=True)
    _run_cli("images_filter.py", model_args + [
        "--img-dir", os.path.join(args.out, "raw_train"),
        "--out-dir", os.path.join(args.out, "train_set")], log,
        timeout=14400)
    _run_cli("images_filter.py", model_args + [
        "--img-dir", os.path.join(args.out, "raw_test"),
        "--out-dir", os.path.join(args.out, "gt")], log, timeout=14400)

    kept = len(os.listdir(os.path.join(args.out, "train_set", "images")))
    kept_gt = len(os.listdir(os.path.join(args.out, "gt", "images")))
    print(f"filtered trainset: {kept}/{args.raw_train} kept "
          f"(need >=2,410); held-out gt: {kept_gt}/{args.test_scenes}")
    if kept < 2410 and not args.mini:
        print("WARNING: below the 2,410 count of record — raise "
              "--raw-train and rerun", flush=True)


if __name__ == "__main__":
    main()
