"""Native C++ host-ops: build, and agreement with the numpy fallbacks."""

import os

import numpy as np
import pytest

from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.utils import native
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.ops import nms as nms_mod
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.attack import eot_eval

requires_native = pytest.mark.skipif(not native.available(),
                                     reason="native lib unavailable")


@requires_native
def test_native_builds():
    assert native.get_lib() is not None


@requires_native
def test_native_iou_matches_numpy(rng):
    a = np.stack([rng.random(17), rng.random(17),
                  0.05 + rng.random(17) * 0.3,
                  0.05 + rng.random(17) * 0.3], 1).astype(np.float32)
    b = np.stack([rng.random(9), rng.random(9),
                  0.05 + rng.random(9) * 0.3,
                  0.05 + rng.random(9) * 0.3], 1).astype(np.float32)
    ours = native.iou_xywh_matrix(a, b)
    ref = np.asarray(nms_mod.iou_xywh_matrix(a, b))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@requires_native
def test_native_nms_matches_numpy(rng):
    n = 200
    boxes = np.stack([rng.random(n), rng.random(n),
                      0.05 + 0.2 * rng.random(n),
                      0.05 + 0.2 * rng.random(n)], 1).astype(np.float32)
    scores = rng.random(n).astype(np.float32)
    got = native.greedy_nms(boxes, scores, 0.4)

    os.environ["APFP_NATIVE"] = "0"
    try:
        # numpy path directly (bypass the native hook)
        order = np.argsort(-scores, kind="stable")
        iou = np.asarray(nms_mod.iou_xywh_matrix(boxes[order], boxes[order]))
        alive = np.ones(n, bool)
        keep = []
        for i in range(n):
            if not alive[i]:
                continue
            keep.append(order[i])
            alive[i + 1:] &= iou[i, i + 1:] <= 0.4
        np.testing.assert_array_equal(got, keep)
    finally:
        os.environ.pop("APFP_NATIVE", None)


@requires_native
def test_native_interference_map_matches_numpy(rng):
    labels = np.array([[0.5, 0.5, 0.2, 0.2, 0.9, 0.9, 3],
                       [0.2, 0.8, 0.1, 0.12, 0.8, 0.9, 4],
                       [0.82, 0.25, 0.15, 0.1, 0.7, 0.9, 1]], np.float32)
    for se in (0, 4, 9):
        got = native.interference_map(labels, se, 64)
        # numpy fallback (copy of the algorithm inside interference_map)
        import adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.utils.native as nat
        lib, nat._lib, nat._tried = nat._lib, None, True  # force fallback
        try:
            want = eot_eval.interference_map(labels, se, 64)
        finally:
            nat._lib, nat._tried = lib, True
        np.testing.assert_allclose(got, want)
        # free set equality is what placement actually consumes
        np.testing.assert_array_equal(got == 0, want == 0)


@requires_native
def test_native_parse_floats():
    text = b"3 0.5 0.25 0.125 0.0625\n14 0.1 0.2 0.3 0.4\n"
    vals = native.parse_floats(text, 64)
    np.testing.assert_allclose(
        vals, [3, 0.5, 0.25, 0.125, 0.0625, 14, 0.1, 0.2, 0.3, 0.4])


def test_numpy_fallbacks_when_native_disabled(rng, monkeypatch):
    """The pure-numpy paths behind the native hooks stay correct when the
    library is unavailable."""
    import adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.utils.native as nat
    monkeypatch.setattr(nat, "_lib", None)
    monkeypatch.setattr(nat, "_tried", True)
    assert not nat.available()

    n = 50
    boxes = np.stack([rng.random(n), rng.random(n),
                      0.05 + 0.2 * rng.random(n),
                      0.05 + 0.2 * rng.random(n)], 1).astype(np.float32)
    scores = rng.random(n).astype(np.float32)
    keep = nms_mod.greedy_nms_host(boxes, scores, 0.4)   # numpy path
    assert len(keep) >= 1 and scores[keep[0]] == scores.max()

    labels = np.array([[0.5, 0.5, 0.2, 0.2, 0.9, 0.9, 3]], np.float32)
    occ = eot_eval.interference_map(labels, 4, 32)       # numpy path
    assert occ.shape == (32, 32) and (occ == 0).any()

    from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.data.labels import read_label_file
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "a.txt")
        open(path, "w").write("3 0.5 0.5 0.1 0.1\n")
        np.testing.assert_allclose(read_label_file(path, 5),
                                   [[3, 0.5, 0.5, 0.1, 0.1]])
