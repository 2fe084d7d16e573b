#!/usr/bin/env python
"""Adversarial-patch training CLI (reference train_patch.py).

    python cli/train_patch.py --mode paper_obj \\
        --img-dir .../trainset/images --lab-dir .../trainset/yolo-labels \\
        --weightfile yolov3-dota.weights --out-dir runs/paper_obj

Every reference experiment mode is available via --mode; any config field
can be overridden by flag. Training state (patch, optimizer, RNG,
scheduler) checkpoints every --checkpoint-every epochs and resumes with
--resume.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu import train as T
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.data.dataset import (
    BatchLoader, DeviceStore, DotaDataset, SyntheticData)
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.utils.checkpoint import save_patch_png


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", default="paper_obj",
                    choices=sorted(T.EXPERIMENTS))
    ap.add_argument("--img-dir", default=None)
    ap.add_argument("--lab-dir", default=None)
    ap.add_argument("--cfgfile", default=None)
    ap.add_argument("--weightfile", default=None)
    ap.add_argument("--out-dir", default="runs/patch")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--learning-rate", type=float, default=None)
    ap.add_argument("--patch-size", type=int, default=None)
    ap.add_argument("--img-size", type=int, default=None)
    ap.add_argument("--warp-method", default=None,
                    choices=("mxu", "gather"),
                    help="EOT warp: MXU matmul-factored (default) or the "
                         "exact grid_sample-parity gather")
    ap.add_argument("--loss-recipe", default=None,
                    choices=T.LOSS_RECIPES)
    ap.add_argument("--target-id", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--debug-nans", action="store_true",
                    help="enable the NaN sanitizer (the reference's "
                         "always-on detect_anomaly)")
    ap.add_argument("--synthetic", type=int, default=0, metavar="N",
                    help="train on N synthetic tiles instead of files "
                         "(smoke/bench)")
    ap.add_argument("--num-workers", type=int, default=8)
    ap.add_argument("--device-store", action="store_true",
                    help="ship the whole trainset to device HBM once "
                         "(uint8) and run each epoch as ONE lax.scan "
                         "program — the protocol-scale path for relay-"
                         "attached TPUs (per-step H2D would otherwise "
                         "dominate the step)")
    args = ap.parse_args(argv)

    overrides = {k: v for k, v in {
        "img_dir": args.img_dir, "lab_dir": args.lab_dir,
        "cfgfile": args.cfgfile, "weightfile": args.weightfile,
        "batch_size": args.batch_size,
        "learning_rate": args.learning_rate,
        "patch_size": args.patch_size, "img_size": args.img_size,
        "warp_method": args.warp_method,
        "loss_recipe": args.loss_recipe,
        "target_id": args.target_id,
        "max_epochs": args.epochs,
    }.items() if v is not None}
    if args.debug_nans:
        overrides["debug_nans"] = True
    exp = T.get_experiment(args.mode, **overrides)

    print(f"mode={exp.name} recipe={exp.loss_recipe} "
          f"batch={exp.batch_size} patch={exp.patch_size} "
          f"lr={exp.learning_rate} target_id={exp.target_id}")
    print(f"devices: {jax.devices()}")

    trainer = T.PatchTrainer(exp, seed=args.seed,
                             checkpoint_dir=args.out_dir)
    start_epoch = 0
    if args.resume and os.path.exists(
            os.path.join(args.out_dir, "ckpt.npz")):
        start_epoch = trainer.restore_checkpoint() + 1
        print(f"resumed at epoch {start_epoch}")

    if args.synthetic:
        data = SyntheticData(args.synthetic, exp.img_size, exp.max_labels)
        n_batches = max(1, args.synthetic // exp.batch_size)

        def make_batches(epoch):
            return [data.batch(exp.batch_size, epoch * 10000 + i)
                    for i in range(n_batches)]
    elif args.device_store:
        ds = DotaDataset(exp.img_dir, exp.lab_dir, exp.max_labels,
                         exp.img_size)
        print(f"{len(ds)} training images -> device store "
              f"(~{len(ds) * exp.img_size**2 * 3 / 2**20:.0f} MB uint8)")
        t0 = time.time()
        store = DeviceStore(ds, num_workers=args.num_workers)
        import jax as _jax
        _jax.block_until_ready(store.images)
        print(f"store resident in {time.time() - t0:.1f}s; "
              f"{-(-len(ds) // exp.batch_size)} batches/epoch "
              f"(partial final batch runs weighted, reference "
              f"drop_last=False semantics)")
    else:
        ds = DotaDataset(exp.img_dir, exp.lab_dir, exp.max_labels,
                         exp.img_size)
        print(f"{len(ds)} training images")
        # drop the partial final batch: the jitted step has a static
        # batch dim and the mesh sharding requires divisibility
        loader = BatchLoader(ds, exp.batch_size, shuffle=True,
                             num_workers=args.num_workers, seed=args.seed,
                             drop_last=True)

        def make_batches(epoch):
            return loader

    epochs = (args.epochs if args.epochs is not None
              else exp.max_epochs) - start_epoch
    t0 = time.time()
    if args.device_store and not args.synthetic:
        patch, history = trainer.train_store(store, epochs=epochs,
                                             start_epoch=start_epoch)
    else:
        patch, history = trainer.train(make_batches, epochs=epochs,
                                       start_epoch=start_epoch)
    print(f"total training time: {(time.time() - t0) / 60:.2f} min")

    os.makedirs(args.out_dir, exist_ok=True)
    save_patch_png(patch, os.path.join(args.out_dir, "final_patch.png"))
    with open(os.path.join(args.out_dir, "history.json"), "w") as f:
        json.dump(history, f, indent=1)
    print(f"saved {args.out_dir}/final_patch.png")


if __name__ == "__main__":
    main()
