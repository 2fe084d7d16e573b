"""bench.py must print its one JSON line no matter what the backend
does: healthy (value > 0), Pallas-fallback (tagged), or a backend that
raises/hangs on init (error field, rc 0). Round-1 and round-2 both lost
their official perf record to unguarded backend failures."""

import json

import pytest

import bench


def test_extract_json_line_picks_metric_record():
    text = ("# comment\n"
            "{\"not\": \"it\"}\n"
            "{\"metric\": \"m\", \"value\": 1.5, \"unit\": \"u\"}\n")
    line = bench._extract_json_line(text)
    assert json.loads(line)["value"] == 1.5
    assert bench._extract_json_line("garbage\nnope") == ""


def test_probe_failure_modes(monkeypatch):
    real_run = bench.subprocess.run

    def crashing(cmd, **kw):
        return real_run([cmd[0], "-c", "import sys; sys.exit(2)"],
                        **{k: v for k, v in kw.items()})
    monkeypatch.setattr(bench.subprocess, "run", crashing)
    assert bench._probe_device_count() == 0


def test_main_emits_error_json_when_backend_unavailable(monkeypatch,
                                                        capsys):
    """Simulated full outage: probe always fails, no backoff sleep; main
    must still print a parsable metric line with an error field and NOT
    raise (the driver records rc)."""
    monkeypatch.setattr(bench, "_probe_device_count", lambda: 0)
    monkeypatch.setattr(bench, "_BACKOFF_S", 0.0)
    monkeypatch.delenv(bench._CHILD_SENTINEL, raising=False)
    bench.main()
    out = capsys.readouterr().out
    rec = json.loads(bench._extract_json_line(out))
    assert rec["value"] == 0.0
    assert rec["vs_baseline"] == 0.0
    assert "error" in rec and rec["error"]


def test_main_emits_error_json_when_child_hangs(monkeypatch, capsys):
    """Probe OK but the bench child itself hangs (relay died between
    probe and compile): the bounded child timeout must convert that to
    the error JSON, not an indefinite block."""
    monkeypatch.setattr(bench, "_probe_device_count", lambda: 1)
    monkeypatch.setattr(bench, "_BACKOFF_S", 0.0)
    monkeypatch.setattr(bench, "_CHILD_TIMEOUT_S", 2.0)
    monkeypatch.setattr(bench, "_CHILD_RETRY_TIMEOUT_S", 2.0)
    monkeypatch.setattr(bench, "_ATTEMPTS", 2)
    monkeypatch.delenv(bench._CHILD_SENTINEL, raising=False)

    real_run = bench.subprocess.run

    def hanging_child(cmd, **kw):
        # stand in for `python bench.py` with a process that never exits
        return real_run([cmd[0], "-c", "import time; time.sleep(600)"],
                        **kw)
    monkeypatch.setattr(bench.subprocess, "run", hanging_child)
    bench.main()
    out = capsys.readouterr().out
    rec = json.loads(bench._extract_json_line(out))
    assert rec["value"] == 0.0
    assert "timed out" in rec["error"]


def test_peak_flops_variant_guard():
    """Unlisted efficiency/inference variants must get None (omit MFU)
    rather than inheriting a bigger chip's peak via prefix match."""
    from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.models.flops import (
        peak_flops_bf16)
    assert peak_flops_bf16("TPU v5 lite") == 197e12
    assert peak_flops_bf16("TPU v5e") == 197e12
    assert peak_flops_bf16("TPU v5p") == 459e12
    assert peak_flops_bf16("TPU v5") == 459e12
    assert peak_flops_bf16("TPU v4") == 275e12
    # digit/space suffix (core index) is fine; alpha qualifier is not
    assert peak_flops_bf16("TPU v5 lite 0") == 197e12
    assert peak_flops_bf16("TPU v4 lite") is None   # v4i-class: unknown
    assert peak_flops_bf16("TPU v4i") is None
    assert peak_flops_bf16("TPU v7x") is None
    assert peak_flops_bf16("cpu") is None


def test_train_step_flops_consistent():
    """fwd+dgrad = 2x forward; yolov3-dota at 608^2 is ~280 GFLOP/img
    (the number behind the recorded ~48% MFU)."""
    from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.models import (
        build_network, yolov3_blocks)
    from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.models.flops import (
        conv_fwd_flops_per_image, train_step_flops_per_image)
    net = build_network(yolov3_blocks())
    fwd = conv_fwd_flops_per_image(net)
    assert train_step_flops_per_image(net) == 2.0 * fwd
    assert 1.0e11 < fwd < 2.0e11, fwd
