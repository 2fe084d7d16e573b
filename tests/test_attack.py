"""Attack-layer tests: EOT geometry vs a torch oracle of the reference's
padded-canvas formulation, reference-box selection quirks, loss formulas
vs independent oracles, and cell extraction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu import attack
from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.data import assets


# ---------------------------------------------------------------------------
# EOT geometry vs torch oracle (reference formulation: pad to canvas, one
# combined affine on patch and all-ones mask, clamp, multiply)
# ---------------------------------------------------------------------------

def _torch_eot_oracle(patch_b_hw3, angle, scale, tx_c, ty_c, img_size):
    import torch
    import torch.nn.functional as F

    b, p, _, _ = patch_b_hw3.shape
    pad = (img_size - p) // 2
    adv = torch.from_numpy(
        patch_b_hw3.transpose(0, 3, 1, 2).copy())      # [B,3,P,P]
    adv = F.pad(adv, (pad, pad, pad, pad))
    msk = F.pad(torch.ones(b, 3, p, p), (pad, pad, pad, pad))

    angle = torch.from_numpy(angle)
    scale = torch.from_numpy(scale)
    tx = torch.from_numpy((0.5 - tx_c) * 2.0)
    ty = torch.from_numpy((0.5 - ty_c) * 2.0)
    sin, cos = torch.sin(angle), torch.cos(angle)
    theta = torch.zeros(b, 2, 3)
    theta[:, 0, 0] = cos / scale
    theta[:, 0, 1] = sin / scale
    theta[:, 0, 2] = (tx * cos + ty * sin) / scale
    theta[:, 1, 0] = -sin / scale
    theta[:, 1, 1] = cos / scale
    theta[:, 1, 2] = (-tx * sin + ty * cos) / scale
    grid = F.affine_grid(theta, adv.shape, align_corners=False)
    adv_t = F.grid_sample(adv, grid, align_corners=False)
    msk_t = F.grid_sample(msk, grid, align_corners=False)
    out = torch.clamp(adv_t, 0, 1) * msk_t
    return out.numpy().transpose(0, 2, 3, 1)


def test_warp_patch_gather_matches_reference_formulation(rng):
    b, p, img = 3, 16, 48
    patch = rng.random((b, p, p, 3), dtype=np.float32)
    angle = rng.uniform(-np.pi, np.pi, b).astype(np.float32)
    scale = rng.uniform(0.2, 1.5, b).astype(np.float32)
    tx = rng.uniform(0.2, 1.0, b).astype(np.float32)
    ty = rng.uniform(0.0, 0.8, b).astype(np.float32)
    adv, mask = attack.warp_patch(
        jnp.asarray(patch), jnp.asarray(angle), jnp.asarray(scale),
        jnp.asarray(tx), jnp.asarray(ty), img, method="gather")
    oracle = _torch_eot_oracle(patch, angle, scale, tx, ty, img)
    np.testing.assert_allclose(np.asarray(adv), oracle, atol=1e-5)


def test_warp_patch_mxu_axis_aligned_exact(rng):
    """For angle in {0, +-90, 180}, the matmul-factored warp is exactly
    the bilinear warp (tensor-product separability)."""
    b, p, img = 4, 16, 48
    patch = rng.random((b, p, p, 3), dtype=np.float32)
    angle = np.array([0.0, np.pi / 2, -np.pi / 2, np.pi], np.float32)
    scale = rng.uniform(0.3, 1.5, b).astype(np.float32)
    tx = rng.uniform(0.2, 1.0, b).astype(np.float32)
    ty = rng.uniform(0.0, 0.8, b).astype(np.float32)
    adv_m, mask_m = attack.warp_patch(
        jnp.asarray(patch), jnp.asarray(angle), jnp.asarray(scale),
        jnp.asarray(tx), jnp.asarray(ty), img, method="mxu")
    oracle = _torch_eot_oracle(patch, angle, scale, tx, ty, img)
    np.testing.assert_allclose(np.asarray(adv_m), oracle, atol=1e-4)


def test_warp_patch_mxu_rotated_close(rng):
    """Under rotation the sheared tensor-product interpolation differs
    from 2-D bilinear only by a small residual."""
    b, p, img = 6, 16, 48
    patch = rng.random((b, p, p, 3), dtype=np.float32)
    angle = rng.uniform(-np.pi, np.pi, b).astype(np.float32)
    scale = rng.uniform(0.4, 1.5, b).astype(np.float32)
    tx = rng.uniform(0.3, 0.7, b).astype(np.float32)
    ty = rng.uniform(0.3, 0.7, b).astype(np.float32)
    args = [jnp.asarray(v) for v in (patch, angle, scale, tx, ty)]
    adv_m, _ = attack.warp_patch(*args, img, method="mxu")
    adv_g, _ = attack.warp_patch(*args, img, method="gather")
    diff = np.abs(np.asarray(adv_m) - np.asarray(adv_g))
    assert diff.mean() < 0.01
    # same support: both place mass in the same region
    assert (np.asarray(adv_m).sum(axis=(1, 2, 3)) > 0).all()


def test_warp_patch_mxu_grad():
    patch = jnp.asarray(np.random.default_rng(0).random((2, 8, 8, 3),
                                                        np.float32))
    def loss(p):
        adv, _ = attack.warp_patch(
            p, jnp.asarray([0.5, -2.0]), jnp.asarray([0.8, 0.5]),
            jnp.asarray([0.5, 0.4]), jnp.asarray([0.5, 0.6]), 32,
            method="mxu")
        return jnp.sum(adv ** 2)
    g = jax.grad(loss)(patch)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_paste_patch_zero_transparency():
    img = jnp.full((1, 4, 4, 3), 0.3)
    adv = jnp.zeros((1, 4, 4, 3)).at[0, 1, 1, :].set(0.9)
    out = attack.paste_patch(img, adv)
    assert np.asarray(out)[0, 1, 1, 0] == pytest.approx(0.9)
    assert np.asarray(out)[0, 0, 0, 0] == pytest.approx(0.3)


# ---------------------------------------------------------------------------
# reference-box selection
# ---------------------------------------------------------------------------

def test_select_reference_box_padding_quirk():
    # one real label + 1e-6 padding rows: "min-area" row is a pad row,
    # so the selected box is ~(real + eps)/2
    labels = np.full((1, 4, 5), 1e-6, dtype=np.float32)
    labels[0, 0] = [2.0, 0.5, 0.6, 0.2, 0.4]
    sel = np.asarray(attack.select_reference_box(jnp.asarray(labels)))[0]
    np.testing.assert_allclose(sel, (labels[0, 0] + 1e-6) / 2, rtol=1e-4)


def test_select_reference_box_empty_sentinel():
    labels = np.ones((2, 3, 5), dtype=np.float32)  # empty-scene sentinel
    sel = np.asarray(attack.select_reference_box(jnp.asarray(labels)))
    np.testing.assert_allclose(sel, 0.25)


def test_patch_scale_uses_reference_columns():
    # quirk: size from cols (2,3) = (y, w) of the averaged row
    labels = np.full((1, 2, 5), 1e-6, dtype=np.float32)
    labels[0, 0] = [0.0, 0.5, 0.6, 0.2, 0.4]
    cfg = attack.EOTConfig(img_size=608, scale_factor=2.0)
    scale, centers, tx, ty = attack.patch_scale_and_center(
        jnp.asarray(labels), jax.random.PRNGKey(0), 224, cfg)
    sel = (labels[0, 0] + 1e-6) / 2
    expect = np.sqrt((sel[2] * 304) ** 2 + (sel[3] * 304) ** 2) / 224
    np.testing.assert_allclose(np.asarray(scale)[0], expect, rtol=1e-5)
    x, y = np.asarray(tx)[0], np.asarray(ty)[0]
    assert 0.2 <= x < 1.0 and 0.0 < y <= 0.8
    np.testing.assert_allclose(np.asarray(centers)[0],
                               [x * 608, y * 608], rtol=1e-6)


# ---------------------------------------------------------------------------
# losses vs oracles
# ---------------------------------------------------------------------------

def test_nps_loss_oracle(rng):
    patch = rng.random((8, 8, 3), dtype=np.float32)
    colors = assets.load_printable_colors()
    ours = float(attack.nps_loss(jnp.asarray(patch), jnp.asarray(colors)))
    d = patch[None] - colors[:, None, None, :] + 1e-6
    dist = np.sqrt((d ** 2).sum(-1) + 1e-6)
    oracle = dist.min(axis=0).sum() / patch.size
    np.testing.assert_allclose(ours, oracle, rtol=1e-6)


def test_total_variation_oracle(rng):
    patch = rng.random((8, 8, 3), dtype=np.float32)
    ours = float(attack.total_variation(jnp.asarray(patch)))
    dx = np.abs(patch[:, 1:] - patch[:, :-1] + 1e-6).sum()
    dy = np.abs(patch[1:] - patch[:-1] + 1e-6).sum()
    np.testing.assert_allclose(ours, (dx + dy) / patch.size, rtol=1e-6)


def test_colorfulness_torch_oracle(rng):
    import torch
    patch = rng.random((8, 8, 3), dtype=np.float32)
    ours = float(attack.colorfulness(jnp.asarray(patch)))
    t = torch.from_numpy(patch.transpose(2, 0, 1))
    rg = t[0] - t[1]
    yb = 0.5 * (t[0] + t[1]) - t[2]
    oracle = (torch.sqrt(torch.var(rg) + torch.var(yb))
              + 0.3 * torch.sqrt(rg.mean() ** 2 + yb.mean() ** 2))
    np.testing.assert_allclose(ours, float(oracle), rtol=1e-5)


def test_extract_cell_scores_and_creation_losses(rng):
    img_size, c = 64, 15
    sizes = [2, 4, 8]
    heads = [rng.standard_normal((2, s, s, 60), dtype=np.float32)
             for s in sizes]
    centers = np.array([[40.0, 10.0], [5.0, 60.0]], dtype=np.float32)
    obj, cls = attack.extract_cell_scores(
        [jnp.asarray(h) for h in heads], jnp.asarray(centers), img_size)
    assert obj.shape == (2, 9) and cls.shape == (2, 9, 15)
    sig = lambda v: 1 / (1 + np.exp(-v))
    # scale 0: stride 32 -> cell (x=1, y=0); swapped -> row=1, col=0
    cell = heads[0][0, 1, 0].reshape(3, 20)
    np.testing.assert_allclose(np.asarray(obj)[0, :3], sig(cell[:, 4]),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(cls)[0, :3], sig(cell[:, 5:]),
                               rtol=1e-5)
    # unswapped variant gathers (row=y_cell, col=x_cell)
    obj2, _ = attack.extract_cell_scores(
        [jnp.asarray(h) for h in heads], jnp.asarray(centers), img_size,
        swap_xy=False)
    cell2 = heads[0][0, 0, 1].reshape(3, 20)
    np.testing.assert_allclose(np.asarray(obj2)[0, :3], sig(cell2[:, 4]),
                               rtol=1e-5)

    loss_obj = float(attack.creation_obj_loss(obj))
    expect = 4 * (1 - np.mean(np.max(np.asarray(obj), axis=1)))
    np.testing.assert_allclose(loss_obj, expect, rtol=1e-6)

    import torch
    ce = torch.nn.CrossEntropyLoss()
    cls_np = np.asarray(cls)
    per_img = [float(ce(torch.from_numpy(cls_np[i]),
                        torch.full((9,), 14, dtype=torch.long)))
               for i in range(2)]
    ours_ce = float(attack.creation_cls_ce_loss(cls, 14))
    np.testing.assert_allclose(ours_ce, np.mean(per_img), rtol=1e-5)

    margin = float(attack.creation_cls_margin_loss(cls, 14))
    expect_m = np.sum(np.mean(cls_np.max(-1) - cls_np[..., 14], axis=1))
    np.testing.assert_allclose(margin, expect_m, rtol=1e-5)


def test_max_prob_extract(rng):
    heads = [rng.standard_normal((2, s, s, 60), dtype=np.float32)
             for s in (2, 4)]
    obj, cls = attack.max_prob_extract([jnp.asarray(h) for h in heads], 3)
    raw = [h.reshape(2, -1, 3, 20) for h in heads]
    all_obj = np.concatenate([r[..., 4].reshape(2, -1) for r in raw], 1)
    all_cls = np.concatenate([r[..., 5 + 3].reshape(2, -1) for r in raw], 1)
    np.testing.assert_allclose(np.asarray(obj), all_obj.max(1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cls), all_cls.max(1), rtol=1e-6)


def test_transform_patch_end_to_end_shapes():
    patch = jnp.full((16, 16, 3), 0.5)
    labels = jnp.ones((2, 3, 5)) * 1e-6
    labels = labels.at[:, 0].set(jnp.asarray([0.0, 0.5, 0.5, 0.3, 0.3]))
    cfg = attack.EOTConfig(img_size=64)
    adv, mask, centers = attack.transform_patch(
        patch, labels, jax.random.PRNGKey(0), cfg)
    assert adv.shape == (2, 64, 64, 3)
    assert mask.shape == (2, 64, 64, 1)
    assert centers.shape == (2, 2)
    a = np.asarray(adv)
    assert (a >= 0).all() and (a <= 1).all()
    assert a.sum() > 0  # patch landed somewhere
    # gradient flows back to the patch through the full stack
    def loss(p):
        adv, _, _ = attack.transform_patch(p, labels, jax.random.PRNGKey(1),
                                           cfg)
        return jnp.sum(adv ** 2)
    g = jax.grad(loss)(patch)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_transform_patch_warp_dtype_bf16():
    """warp_dtype='bfloat16' runs the geometric half narrow: adv/mask
    come back bf16, the composite keeps exact-zero transparency, the
    result stays near the f32 path, and the patch gradient is f32."""
    patch = jnp.full((16, 16, 3), 0.5)
    labels = jnp.ones((2, 3, 5)) * 1e-6
    labels = labels.at[:, 0].set(jnp.asarray([0.0, 0.5, 0.5, 0.3, 0.3]))
    key = jax.random.PRNGKey(0)
    cfg16 = attack.EOTConfig(img_size=64, warp_dtype="bfloat16")
    cfg32 = attack.EOTConfig(img_size=64)
    adv16, mask16, _ = attack.transform_patch(patch, labels, key, cfg16)
    adv32, _, _ = attack.transform_patch(patch, labels, key, cfg32)
    assert adv16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(adv16, np.float32), np.asarray(adv32), atol=8e-3)
    # composite: bf16 adv pastes onto f32 images in bf16, zeros exact
    imgs = jnp.full((2, 64, 64, 3), 0.3, jnp.float32)
    out = attack.paste_patch(imgs, adv16)
    assert out.dtype == jnp.bfloat16
    bg = np.asarray(adv16, np.float32) == 0.0
    np.testing.assert_allclose(
        np.asarray(out, np.float32)[bg], 0.30078125)  # 0.3 in bf16

    def loss(p):
        a, _, _ = attack.transform_patch(p, labels, key, cfg16)
        return jnp.sum(a.astype(jnp.float32) ** 2)
    g = jax.grad(loss)(patch)
    assert g.dtype == jnp.float32
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_warp_places_patch_center_at_target():
    """Property: angle 0, scale s places the patch center pixel block at
    the normalized target center (both warp methods)."""
    p, img = 8, 64
    patch = jnp.ones((1, p, p, 3))
    for method in ("mxu", "gather"):
        for tx, ty in ((0.5, 0.5), (0.25, 0.75)):
            adv, mask = attack.warp_patch(
                patch, jnp.zeros(1), jnp.asarray([1.0]),
                jnp.asarray([tx]), jnp.asarray([ty]), img, method=method)
            m = np.asarray(mask)[0, :, :, 0]
            ys, xs = np.nonzero(m > 0.5)
            cy = (ys.min() + ys.max()) / 2
            cx = (xs.min() + xs.max()) / 2
            # align_corners=False: center lands at target*S - 0.5
            assert abs(cx - (tx * img - 0.5)) <= 1.0, (method, tx, cx)
            assert abs(cy - (ty * img - 0.5)) <= 1.0, (method, ty, cy)
            # extent ~= patch size * scale
            assert abs((xs.max() - xs.min() + 1) - p) <= 2
