"""Utility coverage: profiling helpers, shard helpers, patch PNG I/O."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.utils import (
    StepTimer, annotate, load_patch_png, patch_png_mse, save_patch_png,
    trace)
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.parallel.mesh import (
    make_mesh, shard_batch)


def test_step_timer():
    t = StepTimer(report_every=3)
    x = jnp.ones(4)
    rates = [t.tick(x) for _ in range(7)]
    assert rates[0] is None and rates[1] is None
    # second report boundary (tick 6) has a measured interval
    assert rates[5] is not None and rates[5] > 0


def test_trace_noop_and_annotate():
    with trace(None):          # disabled: no-op
        with annotate("region"):
            _ = jnp.ones(3) + 1


def test_shard_batch():
    mesh = make_mesh()
    a = np.ones((8, 4), np.float32)
    b = np.zeros((8,), np.float32)
    sa, sb = shard_batch(mesh, a, b)
    assert sa.shape == (8, 4) and sb.shape == (8,)
    single = shard_batch(mesh, a)
    assert single.shape == (8, 4)


def test_patch_png_roundtrip_and_resize(tmp_path):
    patch = np.random.default_rng(0).random((16, 16, 3)).astype(np.float32)
    path = str(tmp_path / "p.png")
    save_patch_png(patch, path)
    back = load_patch_png(path)
    assert back.shape == (16, 16, 3)
    # 8-bit quantization bound
    assert np.abs(back - patch).max() <= 1 / 255 + 1e-6
    resized = load_patch_png(path, patch_size=32)
    assert resized.shape == (32, 32, 3)
    save_patch_png(back, str(tmp_path / "q.png"))
    assert patch_png_mse(path, str(tmp_path / "q.png")) == 0.0


def test_enable_compile_cache_off_on_cpu(monkeypatch):
    """The persistent compilation cache must stay off on the CPU backend
    (serializing shard_map+Pallas CPU executables can abort the process)
    and respect APFP_COMPILE_CACHE=0."""
    import jax

    from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.utils.cache import (
        enable_compile_cache)

    before = jax.config.jax_compilation_cache_dir
    assert jax.default_backend() == "cpu"  # conftest forces CPU
    assert enable_compile_cache() is False
    assert jax.config.jax_compilation_cache_dir == before
    monkeypatch.setenv("APFP_COMPILE_CACHE", "0")
    assert enable_compile_cache() is False


def test_plot_history_writes_png(tmp_path):
    """tools/plot_history.py turns a run's train_log.jsonl into the
    loss-decomposition figure (the reference's commented-out np.save
    plotting hook, reference train_patch.py:601-602)."""
    import json
    import sys

    run = tmp_path / "run"
    run.mkdir()
    with open(run / "train_log.jsonl", "w") as f:
        for ep in range(3):
            f.write(json.dumps({
                "epoch": ep, "loss": 7.0 - ep, "no_obj": 3.9, "no_cls": 2.7,
                "tv": 0.4, "colorful": 0.13, "nps": 4e-4, "det": 0.0,
                "lr": 0.03, "epoch_time": 1.0}) + "\n")
    sys.path.insert(0, "tools")
    try:
        import plot_history
        plot_history.main([str(run)])
    finally:
        sys.path.remove("tools")
    assert (run / "loss_curves.png").stat().st_size > 1000
