"""Dataset/label-IO tests: pad_and_scale parity with the reference's
PIL-based preprocessing, label padding quirks, loader behavior."""

import os

import numpy as np
import pytest
from PIL import Image

from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.data import labels as L
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.data.dataset import (
    BatchLoader, DotaDataset, SyntheticData, pad_and_scale)


def test_pad_and_scale_square_noop():
    img = Image.fromarray(np.full((32, 32, 3), 100, np.uint8))
    arr, lab = pad_and_scale(img, np.zeros((0, 5), np.float32), 32)
    assert arr.shape == (32, 32, 3)
    np.testing.assert_allclose(arr, 100 / 255.0, atol=1e-6)


def test_pad_and_scale_tall_image_label_fixup():
    # 20 wide x 40 tall -> pad left/right to 40x40 with gray 127
    img = Image.fromarray(np.zeros((40, 20, 3), np.uint8))
    lab = np.array([[3, 0.5, 0.5, 0.5, 0.25]], np.float32)
    arr, fixed = pad_and_scale(img, lab, 40)
    assert arr.shape == (40, 40, 3)
    # gray padding on the left columns
    np.testing.assert_allclose(arr[0, 0], 127 / 255.0, atol=1e-6)
    # x center: (0.5*20 + 10)/40 = 0.5 ; width: 0.5*20/40 = 0.25
    assert fixed[0, 1] == pytest.approx(0.5)
    assert fixed[0, 3] == pytest.approx(0.25)
    # y untouched
    assert fixed[0, 2] == pytest.approx(0.5)
    assert fixed[0, 4] == pytest.approx(0.25)


def test_pad_and_scale_wide_image_label_fixup():
    img = Image.fromarray(np.zeros((20, 40, 3), np.uint8))
    lab = np.array([[3, 0.5, 0.5, 0.5, 0.25]], np.float32)
    arr, fixed = pad_and_scale(img, lab, 40)
    assert fixed[0, 2] == pytest.approx((0.5 * 20 + 10) / 40)
    assert fixed[0, 4] == pytest.approx(0.25 * 20 / 40)
    assert fixed[0, 1] == pytest.approx(0.5)


def test_pad_labels_sentinel_and_padding():
    empty = np.zeros((0, 5), np.float32)
    out = L.pad_labels(empty, 4)
    np.testing.assert_allclose(out[0], 1.0)      # empty -> ones sentinel
    np.testing.assert_allclose(out[1:], 1e-6)    # pad rows
    two = np.array([[1, .1, .2, .3, .4], [2, .5, .6, .7, .8]], np.float32)
    out = L.pad_labels(two, 4)
    np.testing.assert_array_equal(out[:2], two)
    np.testing.assert_allclose(out[2:], 1e-6)
    # overflow truncates
    out = L.pad_labels(two, 1)
    assert out.shape == (1, 5)


def test_label_file_roundtrip(tmp_path):
    path = str(tmp_path / "a.txt")
    rows = np.array([[3, 0.5, 0.25, 0.125, 0.0625]], np.float32)
    L.write_label_file(path, rows)
    back = L.read_label_file(path, 5)
    np.testing.assert_allclose(back, rows, atol=1e-6)
    # empty/missing
    assert L.read_label_file(str(tmp_path / "missing.txt"), 5).shape \
        == (0, 5)
    open(str(tmp_path / "empty.txt"), "w").close()
    assert L.read_label_file(str(tmp_path / "empty.txt"), 5).shape == (0, 5)


def test_count_instances(tmp_path):
    (tmp_path / "a.txt").write_text("1 0 0 0 0\n2 0 0 0 0\n")
    (tmp_path / "b.txt").write_text("")
    (tmp_path / "c.txt").write_text("3 0 0 0 0\n")
    total, per_file = L.count_instances(str(tmp_path))
    assert total == 3
    assert sorted(per_file) == [1, 2]   # empty files skipped


@pytest.fixture
def image_dataset(tmp_path):
    img_dir = tmp_path / "images"
    lab_dir = tmp_path / "labels"
    img_dir.mkdir()
    lab_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(5):
        arr = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"t{i}.png")
        if i < 4:
            (lab_dir / f"t{i}.txt").write_text("3 0.5 0.5 0.2 0.2\n")
        else:
            (lab_dir / f"t{i}.txt").write_text("")  # empty labels
    return str(img_dir), str(lab_dir)


def test_dota_dataset(image_dataset):
    img_dir, lab_dir = image_dataset
    ds = DotaDataset(img_dir, lab_dir, max_labels=8, img_size=48)
    assert len(ds) == 5
    img, lab = ds[0]
    assert img.shape == (48, 48, 3) and img.dtype == np.float32
    assert lab.shape == (8, 5)
    assert (img >= 0).all() and (img <= 1).all()
    # empty-label image gets the ones sentinel
    img4, lab4 = ds[4]
    np.testing.assert_allclose(lab4[0], 1.0)


def test_dota_dataset_count_mismatch(tmp_path):
    (tmp_path / "img").mkdir()
    (tmp_path / "lab").mkdir()
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
        tmp_path / "img" / "a.png")
    with pytest.raises(ValueError):
        DotaDataset(str(tmp_path / "img"), str(tmp_path / "lab"), 4, 8)


def test_batch_loader(image_dataset):
    img_dir, lab_dir = image_dataset
    ds = DotaDataset(img_dir, lab_dir, max_labels=8, img_size=48)
    loader = BatchLoader(ds, batch_size=2, shuffle=True, num_workers=2,
                         seed=1)
    assert len(loader) == 3
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0][0].shape == (2, 48, 48, 3)
    assert batches[-1][0].shape == (1, 48, 48, 3)   # remainder kept
    # deterministic under the same seed
    loader2 = BatchLoader(ds, batch_size=2, shuffle=True, num_workers=2,
                          seed=1)
    np.testing.assert_array_equal(batches[0][0], list(loader2)[0][0])


def test_synthetic_data_deterministic():
    d = SyntheticData(8, img_size=32, max_labels=4, seed=3)
    a1, l1 = d.batch(4, idx=7)
    a2, l2 = d.batch(4, idx=7)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(l1, l2)
    assert a1.shape == (4, 32, 32, 3) and l1.shape == (4, 4, 5)


def test_filter_min_box_scale():
    """read_truths_args parity (reference utils.py:408-417): rows with
    width < min_box_scale drop; width == threshold survives (the
    reference's `< : continue` keeps equality)."""
    from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.data.labels import filter_min_box_scale
    labs = np.array([[0, .5, .5, .10, .2],
                     [1, .5, .5, .05, .2],
                     [2, .5, .5, .20, .2]], np.float32)
    out = filter_min_box_scale(labs, 0.10)
    np.testing.assert_array_equal(out[:, 0], [0, 2])
    assert filter_min_box_scale(np.zeros((0, 5), np.float32), 0.1).size == 0


def test_batch_loader_early_termination(image_dataset):
    """Breaking out of a BatchLoader iteration mid-epoch stops the
    producer thread (the finally/stop-event path): a fresh iteration
    afterwards still yields every batch."""
    import threading
    from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.data.dataset import BatchLoader
    loader = BatchLoader(image_dataset, batch_size=2, num_workers=2,
                         seed=0)
    n_before = threading.active_count()
    it = iter(loader)
    next(it)
    del it  # consumer abandons mid-epoch -> finally sets stop
    import gc, time
    gc.collect()
    for _ in range(50):  # producer should exit promptly
        if threading.active_count() <= n_before + 2:
            break
        time.sleep(0.1)
    # a fresh epoch still works and is complete
    batches = list(loader)
    assert sum(b[0].shape[0] for b in batches) == len(image_dataset)
