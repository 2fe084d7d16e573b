#!/usr/bin/env python
"""The COMPLETE reference protocol, at the reference's own scale.

The reference's run of record (training_patches_saves/training_logs/
training_test_log.log + README.md): mode paper_obj, batch 24, patch 224,
608^2 tiles, 2,410 victim-pseudo-labeled train images -> 101 batches per
epoch, up to 401 epochs, Adam(amsgrad) lr 0.03 with
ReduceLROnPlateau(patience=50), then the creation-metrics evaluation
(test_patch_DOTA_metrics.py:301-377) on held-out scenes. This tool runs
that WHOLE schedule end to end through the shipped CLIs:

  1. trim the pseudo-labeled trainset to exactly --train-images (2,410,
     the count of record), deterministically (sorted, first N);
  2. leg 1: cli/train_patch.py --device-store for epochs [0, break);
  3. leg 2: the same command with --resume for [break, epochs) — the
     protocol run itself exercises checkpoint/resume mid-schedule;
  4. paste + detect on the held-out set for the trained patch AND a
     random-patch control (same placement machinery + seed);
  5. cli/test_patch_metrics.py --json for both;
  6. write <out>/protocol_summary.json: steps/min, epoch-loss curve
     stats, every plateau-scheduler LR decay with its epoch, resume
     evidence, and the M1/M2/M4/mAP table.

Inputs are directories produced by cli/images_filter.py (see
tools/attack_quality.py for the scene-synthesis + filtering stages; this
tool starts after them because protocol-scale filtering is a long
one-time step worth caching).

Usage:
    python tools/protocol_run.py \
        --train-set /root/protocol/train_set --gt /root/protocol/gt \
        --cfgfile tests/fixtures/refparity_full/yolov3_dota_synth.cfg \
        --weightfile tests/fixtures/refparity_full/yolov3_dota_synth.weights \
        --out /root/protocol/run
"""
import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(script, argv, log, timeout=14400):
    cmd = [sys.executable, os.path.join(REPO, "cli", script)] + \
        [str(a) for a in argv]
    print(f"  $ {script} {' '.join(str(a) for a in argv[:8])} ...",
          flush=True)
    t0 = time.time()
    with open(log, "a") as f:
        f.write(f"\n=== {' '.join(cmd)}\n")
    # stream to the log so a long leg is observable while it runs
    with open(log, "a") as f:
        rc = subprocess.run(cmd, cwd=REPO, stdout=f,
                            stderr=subprocess.STDOUT,
                            timeout=timeout).returncode
    if rc != 0:
        tail = "".join(open(log).readlines()[-20:])
        raise RuntimeError(f"{script} rc={rc}:\n{tail}")
    print(f"    done in {time.time() - t0:.0f}s", flush=True)


def _run_cli_json(script, argv, log, timeout=7200):
    cmd = [sys.executable, os.path.join(REPO, "cli", script)] + \
        [str(a) for a in argv]
    out = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                         timeout=timeout)
    with open(log, "a") as f:
        f.write(f"\n=== {' '.join(cmd)}\n{out.stdout}\n{out.stderr}\n")
    if out.returncode != 0:
        raise RuntimeError(f"{script} rc={out.returncode}:\n"
                           + "\n".join(out.stderr.splitlines()[-15:]))
    for line in reversed(out.stdout.strip().splitlines()):
        if line.strip().startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line from {script}")


def trim_trainset(train_set: str, n: int) -> int:
    """Deterministically trim the filtered trainset to exactly n images
    (sorted, first n); extras move to <train_set>/excess_* so the run
    matches the reference's 2,410-image count of record exactly."""
    img_dir = os.path.join(train_set, "images")
    files = sorted(os.listdir(img_dir))
    if len(files) < n:
        raise SystemExit(f"trainset has {len(files)} < {n} images — "
                         f"synthesize/filter more scenes first")
    for sub in ("images", "yolo-labels", "yolo-labels_w_conf"):
        os.makedirs(os.path.join(train_set, "excess_" + sub),
                    exist_ok=True)
    for name in files[n:]:
        stem = os.path.splitext(name)[0]
        for sub, fname in (("images", name),
                           ("yolo-labels", stem + ".txt"),
                           ("yolo-labels_w_conf", stem + ".txt")):
            src = os.path.join(train_set, sub, fname)
            if os.path.exists(src):
                shutil.move(src, os.path.join(train_set, "excess_" + sub,
                                              fname))
    return len(files[:n])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-set", required=True,
                    help="images_filter output dir (images/ + labels)")
    ap.add_argument("--gt", required=True,
                    help="held-out images_filter output dir")
    ap.add_argument("--cfgfile", required=True)
    ap.add_argument("--weightfile", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--img-size", type=int, default=608)
    ap.add_argument("--patch-size", type=int, default=224)
    ap.add_argument("--train-images", type=int, default=2410,
                    help="trainset size of record")
    ap.add_argument("--epochs", type=int, default=401,
                    help="schedule of record")
    ap.add_argument("--resume-break", type=int, default=201,
                    help="end leg 1 after this many epochs (break-1 "
                         "must hit the every-20 checkpoint grid so leg "
                         "2 resumes exactly there)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    log = os.path.join(args.out, "cli.log")
    run_dir = os.path.join(args.out, "train")
    summary = {"protocol": "paper_obj b24 full schedule",
               "epochs": args.epochs, "train_images": args.train_images,
               "resume_break": args.resume_break, "seed": args.seed}

    kept = trim_trainset(args.train_set, args.train_images)
    n_batches = -(-args.train_images // 24)
    print(f"[1/5] trainset trimmed to {kept} images "
          f"({n_batches} b24 batches/epoch; reference: 2,410 / 101)",
          flush=True)
    summary["batches_per_epoch"] = n_batches

    train_args = [
        "--mode", "paper_obj",
        "--cfgfile", args.cfgfile, "--weightfile", args.weightfile,
        "--img-dir", os.path.join(args.train_set, "images"),
        "--lab-dir", os.path.join(args.train_set, "yolo-labels"),
        "--img-size", args.img_size, "--patch-size", args.patch_size,
        "--seed", args.seed, "--device-store", "--out-dir", run_dir]

    t0 = time.time()
    print(f"[2/5] train leg 1: epochs 0..{args.resume_break - 1}",
          flush=True)
    _run_cli("train_patch.py",
             train_args + ["--epochs", args.resume_break], log)
    t_leg1 = time.time() - t0

    print(f"[3/5] train leg 2 (--resume): "
          f"epochs {args.resume_break}..{args.epochs - 1}", flush=True)
    t0 = time.time()
    _run_cli("train_patch.py",
             train_args + ["--epochs", args.epochs, "--resume"], log)
    t_leg2 = time.time() - t0
    summary["train_seconds"] = {"leg1": round(t_leg1, 1),
                                "leg2": round(t_leg2, 1)}

    # -- schedule evidence from the JSONL epoch log --------------------
    hist = [json.loads(l) for l in
            open(os.path.join(run_dir, "train_log.jsonl"))]
    # the resumed leg re-logs from the checkpoint epoch; keep the last
    # record per epoch (the one that actually produced the final patch)
    by_epoch = {}
    for h in hist:
        by_epoch[h["epoch"]] = h
    epochs_run = sorted(by_epoch)
    lr_decays = []
    prev_lr = None
    for e in epochs_run:
        lr = by_epoch[e]["lr"]
        if prev_lr is not None and lr < prev_lr:
            lr_decays.append({"epoch": e, "lr": lr})
        prev_lr = lr
    total_steps = sum(by_epoch[e]["num_batches"] for e in epochs_run)
    steady = [by_epoch[e]["epoch_time"] for e in epochs_run[2:]]
    steps_min = (n_batches * 60.0 / (sum(steady) / len(steady))
                 if steady else 0.0)
    summary["schedule"] = {
        "epochs_run": len(epochs_run),
        "first_epoch": epochs_run[0], "last_epoch": epochs_run[-1],
        "total_steps": total_steps,
        "loss_first": by_epoch[epochs_run[0]]["loss"],
        "loss_min": min(by_epoch[e]["loss"] for e in epochs_run),
        "loss_last": by_epoch[epochs_run[-1]]["loss"],
        "lr_decays": lr_decays,
        "steady_epoch_seconds": round(sum(steady) / max(len(steady), 1),
                                      2),
        "steps_per_min_steady": round(steps_min, 1),
        "resumed_at": args.resume_break,
    }
    print(f"    schedule: {len(epochs_run)} epochs, {total_steps} steps,"
          f" {steps_min:.0f} steps/min steady, LR decays: {lr_decays}",
          flush=True)

    # -- eval: trained patch vs random control -------------------------
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from attack_quality import write_control_patch
    ctrl_png = os.path.join(args.out, "random_patch.png")
    write_control_patch(ctrl_png, args.patch_size)

    model_args = ["--cfgfile", args.cfgfile,
                  "--weightfile", args.weightfile,
                  "--img-size", args.img_size]
    results = {}
    for name, png in (("trained",
                       os.path.join(run_dir, "final_patch.png")),
                      ("random", ctrl_png)):
        print(f"[4/5] test_patch ({name})", flush=True)
        _run_cli("test_patch.py", model_args + [
            "--patch", png, "--patch-size", args.patch_size,
            "--img-dir", os.path.join(args.gt, "images"),
            "--lab-dir", os.path.join(args.gt, "yolo-labels_w_conf"),
            "--out-dir", os.path.join(args.out, f"attacked_{name}"),
            "--seed", args.seed], log)
        print(f"[5/5] metrics ({name})", flush=True)
        results[name] = _run_cli_json("test_patch_metrics.py", [
            "--pred-dir", os.path.join(args.out, f"attacked_{name}"),
            "--gt-dir", args.gt, "--json"], log)
    summary["results"] = results

    cols = ("M1_avg_instances_created_04", "M1_avg_instances_created_001",
            "M2_avg_conf_created_001", "mAP")
    print("\n| patch | M1@0.4 | M1@0.01 | M2@0.01 | mAP |")
    print("|---|---|---|---|---|")
    for name in ("random", "trained"):
        r = results[name]
        print("| " + " | ".join(
            [name] + ["-" if r.get(c) is None else f"{r[c]:.3f}"
                      for c in cols]) + " |")

    path = os.path.join(args.out, "protocol_summary.json")
    with open(path, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"\nwrote {path}")


if __name__ == "__main__":
    main()
