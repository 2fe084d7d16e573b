#!/usr/bin/env python
"""Per-op device-time attribution of the patch-optimization step.

Captures a ``jax.profiler`` trace of N steps at the given batch size,
parses the perfetto trace.json.gz, and aggregates device-track op time
into categories (stem pallas kernels, tower convs fwd/bwd, layout
copies, median/select, optimizer fusions, ...). This is the tool behind
the ROADMAP attribution tables.

Usage: python tools/step_profile.py [batch] [n_steps]
"""
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu import train as T
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.models import (
    build_network, fold_bn, init_params, yolov3_blocks)
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.parallel.mesh import (
    batch_sharding, make_mesh, replicated)
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.utils.cache import (
    enable_compile_cache)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N = int(sys.argv[2]) if len(sys.argv) > 2 else 10


def build_step():
    enable_compile_cache()
    mesh = make_mesh()
    exp = T.ExperimentConfig(name="prof", img_size=608, patch_size=224,
                             batch_size=B, compute_dtype="bfloat16")
    net = build_network(yolov3_blocks())
    params = jax.device_put(
        fold_bn(net, init_params(net, jax.random.PRNGKey(1))),
        replicated(mesh))
    state = jax.device_put(T.init_train_state(exp, jax.random.PRNGKey(0)),
                           replicated(mesh))
    step = T.make_train_step(net, exp, mesh=mesh)
    imgs = jax.device_put(np.random.rand(B, 608, 608, 3).astype(np.float32),
                          batch_sharding(mesh))
    labs = jax.device_put(np.full((B, 252, 5), 1e-6, np.float32),
                          batch_sharding(mesh))
    return step, state, params, imgs, labs


CATEGORIES = (
    # (label, regex on op name) — first match wins
    ("stem-fwd", r"fused_stem_fwd"),
    ("stem-bwd", r"fused_stem_bwd"),
    ("layout-mxu", r"to_planar|from_planar|planar_mxu"),
    ("conv", r"convolution"),
    ("copy/layout", r"^copy|copy_|bitcast|^transpose|^pad|pad_|^reshape|"
                    r"concatenate|^slice|slice_"),
    ("median/select", r"select|sort|minimum|maximum"),
    ("dot", r"^dot|dot_general"),
    ("reduce", r"reduce"),
    ("fusion", r"^fusion|loop_"),
    ("dynamic-slice/update", r"dynamic"),
)


def categorize(name: str, hlo_category: str = "") -> str:
    """Prefer the trace's own hlo_category for convolution work: XLA
    names a fused conv after its LAST op (e.g. the round-4 mystery
    'convert_reduce_fusion' at b24 was eight 19^2-stage tower convs
    whose forward fusion also bit-packs the leaky-gate signs into
    u32[24,19,1024] — a name-regex filed 3.5 ms of roofline conv time
    under 'reduce'). Pallas custom-calls keep their name-based labels
    (their hlo_category is just 'custom-call')."""
    low = name.lower()
    for label, pat in CATEGORIES[:3]:       # stem/layout pallas kernels
        if re.search(pat, low):
            return label
    if "convolution" in hlo_category:
        return "conv"
    for label, pat in CATEGORIES[3:]:
        if re.search(pat, low):
            return label
    return "other"


def main():
    if os.environ.get("STEP_PROFILE_TRACE"):
        # parse-only mode: re-attribute an existing capture (N must
        # match the capture's step count for per-step math)
        traces = [os.environ["STEP_PROFILE_TRACE"]]
    else:
        step, state, params, imgs, labs = build_step()
        lr = jnp.float32(0.03)
        for _ in range(3):
            state, aux = step(state, params, imgs, labs, lr)
        np.asarray(aux["loss"])

        tmp = tempfile.mkdtemp(prefix="stepprof_")
        jax.profiler.start_trace(tmp)
        for _ in range(N):
            state, aux = step(state, params, imgs, labs, lr)
        np.asarray(aux["loss"])
        jax.profiler.stop_trace()

        traces = glob.glob(os.path.join(
            tmp, "plugins", "profile", "*", "*.trace.json.gz"))
        if not traces:
            sys.exit(f"no trace written under {tmp}")
    with gzip.open(traces[0], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # device tracks: pid names containing "TPU" / "/device:"
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {pid for pid, name in pid_names.items()
                   if "TPU" in name or "/device" in name.lower()}

    by_op = collections.Counter()
    by_cat = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        # skip trace-framework rows, enclosing step markers, and the
        # per-step rows whose name is just the step number
        if name.startswith(("jit_", "pjit", "XLA Modules",
                            "XLA Ops", "Steps")) or name.isdigit():
            continue
        dur = float(e.get("dur", 0.0))  # us
        total += dur
        by_op[name] += dur
        by_cat[categorize(
            name, e.get("args", {}).get("hlo_category", ""))] += dur

    per_step = total / N / 1e3
    print(f"\nbatch {B}, {N} steps; device op time "
          f"{per_step:.2f} ms/step (sum over ops)\n")
    print(f"{'category':<20}{'ms/step':>9}  {'%':>5}")
    for cat, us in by_cat.most_common():
        print(f"{cat:<20}{us / N / 1e3:>9.3f}  {us / total * 100:>5.1f}")
    print(f"\ntop 25 ops (ms/step):")
    for name, us in by_op.most_common(25):
        print(f"  {us / N / 1e3:>8.3f}  {name[:100]}")
    # keep the raw trace for manual inspection
    print(f"\ntrace: {traces[0]}")


if __name__ == "__main__":
    main()
