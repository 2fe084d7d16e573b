"""Eval-layer tests: metric arithmetic on hand-built label sets, AP
computation, detection path on the tiny victim, and the eval/vanishing
transformers."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu import attack, evals
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.data import labels as L
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.models import (
    build_network, fold_bn, init_params, tiny_test_blocks)


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------

def _write_labels(dirpath, rows_per_file):
    os.makedirs(dirpath, exist_ok=True)
    for i, rows in enumerate(rows_per_file):
        L.write_label_file(os.path.join(dirpath, f"img{i}.txt"), rows)


def test_m1_m2_m4_arithmetic(tmp_path):
    # ground truth: 2 images, 1 + 2 instances (7-col)
    gt = [
        [[0.5, 0.5, 0.1, 0.1, 0.8, 0.9, 3]],
        [[0.2, 0.2, 0.1, 0.1, 0.6, 0.8, 5],
         [0.7, 0.7, 0.2, 0.2, 0.5, 0.7, 3]],
    ]
    # predictions: 3 + 4 instances
    pred = [
        [[0.5, 0.5, 0.1, 0.1, 0.8, 0.9, 3],
         [0.3, 0.3, 0.1, 0.1, 0.9, 0.9, 14],
         [0.8, 0.3, 0.1, 0.1, 0.7, 0.9, 14]],
        [[0.2, 0.2, 0.1, 0.1, 0.6, 0.8, 5],
         [0.7, 0.7, 0.2, 0.2, 0.5, 0.7, 3],
         [0.4, 0.6, 0.1, 0.1, 0.95, 0.9, 14],
         [0.6, 0.4, 0.1, 0.1, 0.85, 0.9, 14]],
    ]
    gt_dir, pred_dir = str(tmp_path / "gt"), str(tmp_path / "pred")
    _write_labels(gt_dir, gt)
    _write_labels(pred_dir, pred)

    m1 = evals.m1_average_instances_created(pred_dir, gt_dir, n_images=2)
    assert m1 == pytest.approx((7 - 3) / 2)

    conf_gt = 0.8 + 0.6 + 0.5
    conf_pred = conf_gt + 0.9 + 0.7 + 0.95 + 0.85
    m2 = evals.m2_average_confidence_created(pred_dir, gt_dir)
    assert m2 == pytest.approx((conf_pred - conf_gt) / 4)

    m4 = evals.m4_per_class_gap(pred_dir, gt_dir)
    assert m4[14] == 4 and m4[3] == 0 and m4.sum() == 4

    report = evals.creation_metrics_report(
        pred_dir, gt_dir, pred_dir, gt_dir, n_images=2)
    assert report["M1_avg_instances_created_001"] == pytest.approx(2.0)
    assert report["M4_per_class_gap_001"][14] == 4


def test_precision_recall():
    gt = [np.array([[3, 0.5, 0.5, 0.2, 0.2]], np.float32)]
    pred = [np.array([
        [0.5, 0.5, 0.2, 0.2, 0.9, 0.9, 3],     # match
        [0.1, 0.1, 0.05, 0.05, 0.9, 0.9, 4],   # false positive
        [0.9, 0.9, 0.05, 0.05, 0.1, 0.2, 4],   # below conf
    ], np.float32)]
    p, r = evals.precision_recall(pred, gt, conf_thresh=0.4)
    assert r == pytest.approx(1.0, abs=1e-6)
    assert p == pytest.approx(0.5, abs=1e-6)


def test_ap_from_pr_known_values():
    # perfect detector: precision 1 at all recalls
    ap = evals.ap_from_pr(np.array([0.5, 1.0]), np.array([1.0, 1.0]))
    assert ap == pytest.approx(1.0)
    # VOC-07 metric sanity
    ap07 = evals.ap_from_pr(np.array([0.5, 1.0]), np.array([1.0, 0.5]),
                            use_07_metric=True)
    assert 0 < ap07 <= 1


def test_average_precision_ranked():
    gt = [np.array([[0, 0.5, 0.5, 0.2, 0.2]], np.float32)]
    pred_hit = [np.array([[0.5, 0.5, 0.2, 0.2, 0.9, 0.9, 0]], np.float32)]
    assert evals.average_precision(pred_hit, gt) == pytest.approx(1.0)
    pred_miss = [np.array([[0.1, 0.1, 0.2, 0.2, 0.9, 0.9, 0]], np.float32)]
    assert evals.average_precision(pred_miss, gt) == 0.0


# ---------------------------------------------------------------------------
# detection path
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_detector():
    net = build_network(tiny_test_blocks())
    params = fold_bn(net, init_params(net, jax.random.PRNGKey(5)))
    # max_candidates above the tiny net's 252 cells: no pre-NMS pruning,
    # so host and device paths must agree exactly
    return evals.Detector(net, params, img_size=64,
                          compute_dtype=jnp.float32, max_candidates=256)


def test_detector_runs(tiny_detector, rng):
    imgs = rng.random((2, 64, 64, 3), dtype=np.float32)
    dets = tiny_detector.detect_batch(imgs, conf_thresh=0.1,
                                      nms_thresh=0.4)
    assert len(dets) == 2
    for d in dets:
        assert d.shape[1] == 7
        if len(d):
            # scores above threshold, class ids in range
            assert (d[:, 4] * d[:, 5] > 0.1).all()
            assert ((d[:, 6] >= 0) & (d[:, 6] < 15)).all()


def test_detector_threshold_monotone(tiny_detector, rng):
    img = rng.random((64, 64, 3), dtype=np.float32)
    low = tiny_detector.detect(img, 0.05, 0.4)
    high = tiny_detector.detect(img, 0.5, 0.4)
    assert len(high) <= len(low)


def test_detector_dense_scene_not_truncated(tiny_detector, rng):
    """A conf sweep denser than the pre-NMS top-k cap must fall back to
    the full candidate set, not silently truncate (round-1 weakness:
    M1@0.01 deflation on dense post-attack scenes)."""
    net = build_network(tiny_test_blocks())
    params = fold_bn(net, init_params(net, jax.random.PRNGKey(5)))
    pruned = evals.Detector(net, params, img_size=64,
                            compute_dtype=jnp.float32, max_candidates=16)
    imgs = rng.random((2, 64, 64, 3), dtype=np.float32)
    # at conf 1e-6 every one of the tiny net's 252 candidates survives,
    # saturating the 16-row prune -> exercises the full-decode fallback
    dense = pruned.detect_batch(imgs, conf_thresh=1e-6, nms_thresh=0.4)
    exact = tiny_detector.detect_batch(imgs, conf_thresh=1e-6,
                                       nms_thresh=0.4)
    for d, e in zip(dense, exact):
        assert len(d) == len(e)
        np.testing.assert_allclose(d, e, rtol=1e-6, atol=1e-6)


def test_detections_to_label_rows():
    dets = np.array([[0.5, 0.5, 0.1, 0.2, 0.9, 0.8, 7]], np.float32)
    five = evals.detections_to_label_rows(dets, with_conf=False)
    np.testing.assert_allclose(five, [[7, 0.5, 0.5, 0.1, 0.2]])


# ---------------------------------------------------------------------------
# eval transformer / interference avoidance
# ---------------------------------------------------------------------------

def test_interference_map_avoids_boxes_and_borders():
    labels = np.array([[0.5, 0.5, 0.2, 0.2, 0.9, 0.9, 3],
                       [0.2, 0.8, 0.1, 0.1, 0.8, 0.9, 4]], np.float32)
    occ = attack.interference_map(labels, semi_edge=8, img_size=64)
    assert occ.shape == (64, 64)
    assert occ[0, 32] > 0 and occ[32, 0] > 0        # borders occupied
    assert occ[32, 32] > 0                          # box center occupied
    free = np.argwhere(occ == 0)
    assert len(free) > 0
    # free cells are away from the dilated box (rows=x quirk)
    for r, c in free[:50]:
        assert not (24 - 8 <= r < 40 + 8 and 24 - 8 <= c < 40 + 8)


def test_select_reference_box_7col():
    one = np.array([[0.5, 0.5, 0.2, 0.2, 0.9, 0.9, 3]], np.float32)
    np.testing.assert_allclose(attack.select_reference_box_7col(one), 0.25)
    sentinel = np.ones((3, 7), np.float32)
    np.testing.assert_allclose(
        attack.select_reference_box_7col(sentinel), 0.25)
    two = np.array([[0.5, 0.5, 0.4, 0.4, 0.9, 0.9, 3],
                    [0.2, 0.2, 0.1, 0.1, 0.8, 0.9, 4]], np.float32)
    np.testing.assert_allclose(
        attack.select_reference_box_7col(two), (two[0] + two[1]) / 2)


def test_transform_patch_eval_places_patch(rng):
    patch = jnp.asarray(rng.random((8, 8, 3), np.float32))
    labels = np.array([[0.5, 0.5, 0.3, 0.3, 0.9, 0.9, 3],
                       [0.15, 0.8, 0.1, 0.12, 0.8, 0.9, 4]], np.float32)
    cfg = attack.EvalEOTConfig(img_size=64)
    adv, (tx, ty) = attack.transform_patch_eval(
        patch, labels, np.random.default_rng(0), cfg)
    assert adv.shape == (64, 64, 3)
    assert adv.sum() > 0
    assert 0 <= tx <= 1 and 0 <= ty <= 1
    img = jnp.full((1, 64, 64, 3), 0.5)
    out = attack.paste_patch(img, jnp.asarray(adv)[None])
    assert not np.allclose(np.asarray(out), 0.5)


# ---------------------------------------------------------------------------
# vanishing transformer
# ---------------------------------------------------------------------------

def test_vanishing_transformer(rng):
    patch = jnp.asarray(rng.random((8, 8, 3), np.float32))
    labels = np.full((2, 4, 5), 1e-6, np.float32)
    labels[0, 0] = [1, 0.3, 0.3, 0.3, 0.3]
    labels[0, 1] = [2, 0.7, 0.7, 0.25, 0.2]
    labels[1, 0] = [0, 0.5, 0.5, 0.4, 0.4]
    cfg = attack.VanishingConfig(img_size=64)
    adv = attack.transform_patch_vanishing(
        patch, jnp.asarray(labels), jax.random.PRNGKey(0), cfg)
    assert adv.shape == (2, 4, 64, 64, 3)
    a = np.asarray(adv)
    assert a[0, 0].sum() > 0 and a[0, 1].sum() > 0
    # padding rows produce (sub-pixel) empty layers
    assert a[0, 3].sum() < a[0, 0].sum() * 0.01
    imgs = jnp.full((2, 64, 64, 3), 0.5)
    out = attack.paste_vanishing(imgs, adv)
    assert out.shape == (2, 64, 64, 3)
    assert not np.allclose(np.asarray(out[0]), 0.5)


def test_detect_batch_device_matches_host(tiny_detector, rng):
    imgs = rng.random((2, 64, 64, 3), dtype=np.float32)
    host = tiny_detector.detect_batch(imgs, 0.2, 0.4)
    dets, valid, sat = tiny_detector.detect_batch_device(imgs, 0.2, 0.4)
    dets, valid = np.asarray(dets), np.asarray(valid)
    # 252 candidates < the 2,400-candidate prune: provably complete
    assert not np.asarray(sat).any()
    for i in range(2):
        dev = dets[i][valid[i]]
        h = host[i][:300]
        assert len(dev) == len(h)
        np.testing.assert_allclose(dev, h, atol=1e-5, rtol=1e-4)


def test_transform_patch_eval_degenerate_labels_finite(rng):
    """Regression: a label set whose every row is non-finite
    (exp-overflow detections from an untrained victim) must not produce
    a NaN canvas — the zero-area reference box once drove the warp
    scale to 0 and the inverse-affine inverted a singular matrix."""
    import numpy as np
    import jax.numpy as jnp
    from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu import attack
    patch = jnp.asarray(rng.random((32, 32, 3)).astype(np.float32))
    labels = np.full((50, 7), np.inf, np.float32)
    labels[:, 4:6] = 0.9
    cfg = attack.EvalEOTConfig(img_size=64)
    adv, center = attack.transform_patch_eval(
        patch, labels, np.random.default_rng(0), cfg)
    assert np.isfinite(np.asarray(adv)).all()
    imgs = jnp.full((1, 64, 64, 3), 0.3, jnp.float32)
    out = np.asarray(attack.paste_patch(imgs, jnp.asarray(adv)[None]))
    assert np.isfinite(out).all()


def test_detect_batch_device_saturation_contract(rng):
    """End-to-end pruning contract (VERDICT r4 #4): at a geometry with
    more than 2,400 (= 8*300) candidates, an all-pass conf threshold
    must raise the saturated flag (results = lower bound), and a normal
    threshold on the same scene must not. The tiny net at 224^2 has
    3,087 candidates — past the prune for the first time in the suite."""
    net = build_network(tiny_test_blocks(width=224, height=224))
    params = fold_bn(net, init_params(net, jax.random.PRNGKey(5)))
    det = evals.Detector(net, params, img_size=224,
                         compute_dtype=jnp.float32)
    imgs = rng.random((1, 224, 224, 3), dtype=np.float32)
    # conf -1: every candidate passes (obj sigmoid > 0 always)
    _, _, sat_dense = det.detect_batch_device(imgs, -1.0, 0.4)
    assert np.asarray(sat_dense).all()
    # a real threshold keeps the candidate count under the prune
    _, _, sat_sparse = det.detect_batch_device(imgs, 0.9, 0.4)
    assert not np.asarray(sat_sparse).any()


def test_class_color_reference_ramp_values():
    """class_color pins the reference's color hash exactly
    (utils.py:294-334: offset = cls_id*123457 % classes over the
    magenta/blue/cyan/green/yellow/red ramp, channels returned BGR->RGB
    swapped). Oracle values computed from the reference formula."""
    from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.evals import class_color
    expected = [
        (255, 0, 255), (169, 255, 0), (0, 84, 255), (255, 255, 0),
        (0, 169, 255), (255, 169, 0), (0, 255, 255), (255, 84, 0),
        (0, 255, 169), (255, 0, 0), (0, 255, 84), (255, 0, 85),
        (0, 255, 0), (255, 0, 170), (85, 255, 0)]
    got = [class_color(c, 15) for c in range(15)]
    assert got == expected
