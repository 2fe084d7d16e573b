"""Benchmark: patch-optimization steps/min on the flagship pipeline.

Measures the full jitted train step (EOT transform + composite + YOLOv3
forward/backward through all 75 convs + creation losses + amsgrad update)
at batch 8, 608x608, bfloat16 detector compute, on whatever devices are
visible (one v5e chip under the driver).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is the image-throughput ratio vs. the reference's logged
V100S run (~0.8 steps/s at batch 24 => 19.2 img/s; BASELINE.md).

Outage-resilient by construction (the TPU relay has been down during
both previous driver runs — r01 raise, r02 raise inside backend probe):
the measurement runs in a time-bounded child process behind a
time-bounded device probe, with bounded retries (relay outages observed
so far were transient). If the backend never comes back, the JSON line
is still printed, with an "error" field, and the process exits 0.
"""

import json
import os
import subprocess
import sys
import time

BATCH = 8
IMG = 608
REFERENCE_IMG_PER_S = 19.2  # V100S, batch 24, ~0.8 steps/s (BASELINE.md)
METRIC = f"patch_train_steps_per_min_b{BATCH}"

_CHILD_SENTINEL = "_ADV_BENCH_CHILD"
_ATTEMPTS = 3
_BACKOFF_S = 45.0
_PROBE_TIMEOUT_S = 60.0
# A cold first compile of the full step program through the TPU relay is
# ~9 min (verify skill), so the first attempt gets a generous bound; a
# retry after a timeout is dealing with a hang, not a compile, and gets
# a shorter one to keep the worst case inside driver budgets.
_CHILD_TIMEOUT_S = 1200.0
_CHILD_RETRY_TIMEOUT_S = 480.0


def _run_bench() -> None:
    """The actual measurement (child process). Prints the JSON line."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu import train as T
    from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.utils.cache import enable_compile_cache
    from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.models import (
        build_network, fold_bn, init_params, yolov3_blocks)
    from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.parallel.mesh import (
        batch_sharding, make_mesh, replicated)

    try:
        enable_compile_cache()
    except Exception:  # noqa: BLE001 - cache is an optimization only
        pass
    mesh = make_mesh()
    n_dev = mesh.devices.size
    exp = T.ExperimentConfig(
        name="bench", img_size=IMG, patch_size=224, batch_size=BATCH,
        max_labels=252, compute_dtype="bfloat16")
    net = build_network(yolov3_blocks())
    params = fold_bn(net, init_params(net, jax.random.PRNGKey(1)))

    rep = replicated(mesh)
    data = batch_sharding(mesh)
    params = jax.device_put(params, rep)
    state = jax.device_put(T.init_train_state(exp, jax.random.PRNGKey(0)),
                           rep)
    step = T.make_train_step(net, exp, mesh=mesh)

    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.random((BATCH, IMG, IMG, 3), np.float32), data)
    labels = np.full((BATCH, 252, 5), 1e-6, np.float32)
    labels[:, 0] = [0, 0.5, 0.5, 0.1, 0.15]
    labels = jax.device_put(labels, data)
    lr = jnp.float32(0.03)

    # warmup / compile. Safety net: if the Pallas fast paths fail to
    # compile on this backend (e.g. a Mosaic/libtpu version skew), fall
    # back to the pure-XLA step rather than reporting nothing — but TAG
    # the emitted JSON so a fallback can never masquerade as the fused
    # number.
    fused_fallback = False
    fallback_reason = None
    try:
        for _ in range(3):
            state, aux = step(state, params, images, labels, lr)
        jax.block_until_ready(state.patch)
    except Exception as e:  # noqa: BLE001
        fused_fallback = True
        fallback_reason = type(e).__name__
        print(f"# fused-kernel path failed ({fallback_reason}); "
              f"falling back to the XLA stem", flush=True)
        os.environ["ADV_PATCH_FUSED_STEM"] = "0"
        os.environ["ADV_PATCH_MXU_LAYOUT"] = "0"
        state = jax.device_put(
            T.init_train_state(exp, jax.random.PRNGKey(0)), rep)
        step = T.make_train_step(net, exp, mesh=mesh)
        for _ in range(3):
            state, aux = step(state, params, images, labels, lr)
        jax.block_until_ready(state.patch)

    n_steps = 30
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, aux = step(state, params, images, labels, lr)
    jax.block_until_ready(state.patch)
    dt = time.perf_counter() - t0

    steps_per_min = n_steps / dt * 60.0
    img_per_s = n_steps * BATCH / dt
    record = {
        "metric": f"{METRIC}_{n_dev}dev",
        "value": round(steps_per_min, 2),
        "unit": "steps/min",
        "vs_baseline": round(img_per_s / REFERENCE_IMG_PER_S, 3),
        "ms_per_step": round(dt / n_steps * 1e3, 2),
    }
    # Analytic MFU (conv fwd + dgrad FLOPs of the frozen-victim step /
    # the chip's bf16 peak); None/absent on device kinds without a
    # known peak (e.g. the CPU fallback path).
    from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.models import flops as _flops
    mfu = _flops.mfu(dt / n_steps, BATCH, net,
                     jax.devices()[0].device_kind, n_devices=n_dev)
    if mfu is not None:
        record["mfu"] = round(mfu, 4)
    if fused_fallback:
        record["fused_fallback"] = True
        record["fallback_reason"] = fallback_reason
    print(json.dumps(record))


def _probe_device_count() -> int:
    """Count devices in a time-bounded subprocess; 0 on timeout/crash.
    Out-of-process because a mid-outage relay makes backend init HANG
    rather than raise (see __graft_entry__._probe_device_count)."""
    try:
        out = subprocess.run(
            [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
            capture_output=True, text=True, timeout=_PROBE_TIMEOUT_S,
            cwd=os.path.dirname(os.path.abspath(__file__)),
            env=dict(os.environ))
    except (subprocess.TimeoutExpired, OSError):
        return 0
    if out.returncode != 0:
        return 0
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return int(line.strip())
        except ValueError:
            continue
    return 0


def _extract_json_line(text: str) -> str:
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "metric" in rec and "value" in rec:
                return line
    return ""


def main() -> None:
    if os.environ.get(_CHILD_SENTINEL) == "1":
        _run_bench()
        return

    last_err = "no attempt ran"
    for attempt in range(_ATTEMPTS):
        if attempt:
            print(f"# backend unavailable ({last_err}); retrying in "
                  f"{_BACKOFF_S:.0f}s ({attempt + 1}/{_ATTEMPTS})",
                  flush=True)
            time.sleep(_BACKOFF_S)
        if _probe_device_count() < 1:
            last_err = "device probe failed/timed out"
            continue
        env = dict(os.environ)
        env[_CHILD_SENTINEL] = "1"
        child_timeout = (_CHILD_TIMEOUT_S if attempt == 0
                         else _CHILD_RETRY_TIMEOUT_S)
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True, timeout=child_timeout)
        except subprocess.TimeoutExpired:
            last_err = f"bench child timed out after {child_timeout:.0f}s"
            continue
        line = _extract_json_line(out.stdout)
        if out.returncode == 0 and line:
            for extra in out.stdout.strip().splitlines():
                if extra.strip().startswith("#"):
                    print(extra, flush=True)
            print(line)
            return
        last_err = (f"bench child rc={out.returncode}: "
                    + out.stderr.strip().splitlines()[-1][-300:]
                    if out.stderr.strip() else
                    f"bench child rc={out.returncode}")
    print(json.dumps({
        "metric": f"{METRIC}_0dev",
        "value": 0.0,
        "unit": "steps/min",
        "vs_baseline": 0.0,
        "error": last_err,
    }))


if __name__ == "__main__":
    main()
