"""End-to-end CLI tests on a tiny victim: dataset build -> clean
inference -> patch training -> patched eval -> metrics. This is the
integration-test analog of the reference's script pipeline."""

import os
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "cli"))

import adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.models as M


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    path = tmp_path_factory.mktemp("cfg") / "tiny.cfg"
    M.write_darknet_cfg(M.tiny_test_blocks(), path)
    return str(path)


@pytest.fixture(scope="module")
def raw_images(tmp_path_factory):
    d = tmp_path_factory.mktemp("raw")
    rng = np.random.default_rng(0)
    for i in range(3):
        arr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"tile{i}.png")
    return str(d)


MODEL_ARGS = ["--img-size", "64", "--fp32"]


@pytest.mark.slow
def test_full_cli_pipeline(tiny_cfg, raw_images, tmp_path):
    import images_filter
    import clean_img_pre
    import train_patch
    import test_patch
    import test_patch_metrics

    gt_dir = str(tmp_path / "trainset")
    images_filter.main([
        "--cfgfile", tiny_cfg, *MODEL_ARGS,
        "--img-dir", raw_images, "--out-dir", gt_dir,
        "--conf", "0.01", "--batch-size", "2"])
    assert os.path.isdir(os.path.join(gt_dir, "images"))
    kept = os.listdir(os.path.join(gt_dir, "images"))
    assert len(kept) >= 1
    assert len(os.listdir(os.path.join(gt_dir, "yolo-labels_w_conf"))) \
        == len(kept)

    clean_dir = str(tmp_path / "clean")
    clean_img_pre.main([
        "--cfgfile", tiny_cfg, *MODEL_ARGS,
        "--img-dir", raw_images, "--out-dir", clean_dir,
        "--conf", "0.2", "--save-images", "--batch-size", "2"])
    assert len(os.listdir(os.path.join(clean_dir, "yolo-labels"))) == 3
    assert len(os.listdir(os.path.join(clean_dir, "images"))) == 3

    # class-filtered GT generation (reference's commented variant:
    # clean_img_pre.py:190-196 keeps cls_id==5, w/h >= 0.1)
    cf_dir = str(tmp_path / "clean_cf")
    clean_img_pre.main([
        "--cfgfile", tiny_cfg, *MODEL_ARGS,
        "--img-dir", raw_images, "--out-dir", cf_dir,
        "--conf", "0.2", "--batch-size", "2",
        "--class-filter", "5", "--min-box-size", "0.1"])
    import glob
    for f in glob.glob(os.path.join(cf_dir, "yolo-labels", "*.txt")):
        rows = np.loadtxt(f, ndmin=2)
        if rows.size:
            assert (rows[:, 6] == 5).all()
            assert (rows[:, 2] >= 0.1).all() and (rows[:, 3] >= 0.1).all()

    run_dir = str(tmp_path / "run")
    train_patch.main([
        "--mode", "paper_obj", "--cfgfile", tiny_cfg, "--img-size", "64",
        "--patch-size", "16", "--batch-size", "4", "--epochs", "1",
        "--synthetic", "8", "--out-dir", run_dir])
    patch_png = os.path.join(run_dir, "final_patch.png")
    assert os.path.exists(patch_png)
    assert os.path.exists(os.path.join(run_dir, "history.json"))

    attacked_dir = str(tmp_path / "attacked")
    test_patch.main([
        "--cfgfile", tiny_cfg, *MODEL_ARGS,
        "--patch", patch_png, "--patch-size", "16",
        "--img-dir", os.path.join(gt_dir, "images"),
        "--lab-dir", os.path.join(gt_dir, "yolo-labels_w_conf"),
        "--out-dir", attacked_dir, "--conf", "0.01"])
    assert len(os.listdir(os.path.join(attacked_dir,
                                       "yolo-labels_w_conf"))) == len(kept)

    report = test_patch_metrics.main([
        "--pred-dir", attacked_dir, "--gt-dir", gt_dir, "--json"])
    assert "M1_avg_instances_created_001" in report
    assert "mAP" in report
    assert len(report["M4_per_class_gap_001"]) == 15


def test_dataset_tools(raw_images, tmp_path):
    import dataset_tools
    lab_dir = tmp_path / "labels"
    lab_dir.mkdir()
    for i in range(3):
        (lab_dir / f"tile{i}.txt").write_text("3 0.5 0.5 0.1 0.1\n")
    out = tmp_path / "list.txt"
    dataset_tools.main(["list-files", "--img-dir", raw_images,
                        "--out", str(out)])
    assert len(out.read_text().splitlines()) == 3
    dataset_tools.main(["stats", "--img-dir", raw_images,
                        "--lab-dir", str(lab_dir)])
    pred_dir = tmp_path / "preds"
    pred_dir.mkdir()
    for i in range(3):
        (pred_dir / f"tile{i}.txt").write_text(
            "0.5 0.5 0.1 0.1 0.9 0.9 3\n")
    dataset_tools.main(["recall", "--pred-dir", str(pred_dir),
                        "--gt-dir", str(lab_dir), "--conf", "0.0"])


@pytest.mark.slow
def test_paste_patch_cli_fixed_and_eot(raw_images, tmp_path):
    """cli/paste_patch.py end to end — the working replacement for the
    reference's broken patch_applier.py (its load_weights call doesn't
    exist, reference patch_applier.py:45). Fixed placement: the patch
    lands centered, borders untouched. EOT placement: output differs
    from the source but stays in [0, 1]."""
    import paste_patch
    rng = np.random.default_rng(3)
    patch_png = str(tmp_path / "patch.png")
    Image.fromarray(
        (rng.random((16, 16, 3)) * 128 + 127).astype(np.uint8)
    ).save(patch_png)

    fixed_dir = str(tmp_path / "fixed")
    paste_patch.main([
        "--patch", patch_png, "--patch-size", "16",
        "--img-dir", raw_images, "--out-dir", fixed_dir,
        "--img-size", "64",
        "--fixed-center", "0.5", "0.5", "--fixed-scale", "0.4"])
    outs = sorted(os.listdir(fixed_dir))
    assert len(outs) == 3
    src = np.asarray(Image.open(
        os.path.join(raw_images, "tile0.png")), np.float32)
    out = np.asarray(Image.open(
        os.path.join(fixed_dir, "tile0.png")), np.float32)
    # borders untouched (patch occupies ~0.4*64 = 26 px around center)
    np.testing.assert_array_equal(out[:8], src[:8])
    np.testing.assert_array_equal(out[-8:], src[-8:])
    np.testing.assert_array_equal(out[:, :8], src[:, :8])
    # center changed
    assert not np.array_equal(out[24:40, 24:40], src[24:40, 24:40])

    # EOT placement driven by per-image labels
    lab_dir = tmp_path / "labs"
    lab_dir.mkdir()
    for i in range(3):
        (lab_dir / f"tile{i}.txt").write_text("2 0.5 0.5 0.4 0.4\n")
    eot_dir = str(tmp_path / "eot")
    paste_patch.main([
        "--patch", patch_png, "--patch-size", "16",
        "--img-dir", raw_images, "--lab-dir", str(lab_dir),
        "--out-dir", eot_dir, "--img-size", "64", "--seed", "7"])
    out = np.asarray(Image.open(
        os.path.join(eot_dir, "tile0.png")), np.float32) / 255.0
    assert out.min() >= 0 and out.max() <= 1
    assert not np.array_equal(out, src / 255.0)


@pytest.mark.slow
def test_train_patch_debug_nans_smoke(tiny_cfg, tmp_path):
    """--debug-nans (the reference's always-on detect_anomaly analog,
    train_patch.py:158) runs a clean 1-epoch synthetic train without
    tripping, then is reset so later tests aren't affected."""
    import jax
    import train_patch
    try:
        train_patch.main([
            "--mode", "paper_obj", "--cfgfile", tiny_cfg,
            "--img-size", "64", "--patch-size", "16",
            "--batch-size", "4", "--epochs", "1", "--synthetic", "4",
            "--debug-nans", "--out-dir", str(tmp_path / "run")])
        assert jax.config.jax_debug_nans
    finally:
        jax.config.update("jax_debug_nans", False)
    assert os.path.exists(tmp_path / "run" / "final_patch.png")
