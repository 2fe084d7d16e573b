"""Darknet model tests: cfg parsing, weight I/O round-trip, and numerical
parity of the layer semantics against a PyTorch oracle (torch used only as
an independent reference implementation of darknet layer semantics)."""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.models as M


def test_parse_cfg_roundtrip(tmp_path):
    blocks = M.yolov3_blocks()
    path = tmp_path / "net.cfg"
    M.write_darknet_cfg(blocks, path)
    reparsed = M.parse_darknet_cfg(path)
    assert reparsed == blocks


def test_parse_cfg_conv_bn_default():
    text = "[net]\nwidth=32\nheight=32\nchannels=3\n[convolutional]\nfilters=4\nsize=1\nstride=1\npad=1\nactivation=linear\n"
    blocks = M.parse_darknet_cfg(text)
    assert blocks[1]["batch_normalize"] == "0"


def test_yolov3_structure():
    blocks = M.yolov3_blocks()
    kinds = [b["type"] for b in blocks[1:]]
    assert kinds.count("convolutional") == 75
    assert kinds.count("shortcut") == 23
    assert kinds.count("route") == 4
    assert kinds.count("upsample") == 2
    assert kinds.count("yolo") == 3
    net = M.build_network(blocks)
    assert net.num_classes == 15
    # head conv has 3*(5+15)=60 filters, no BN, linear activation
    convs = M.conv_specs(net)
    heads = [c for c in convs if c.filters == 60]
    assert len(heads) == 3
    assert all(not c.bn and c.activation == "linear" for c in heads)
    assert M.head_strides(net, 608) == [32, 16, 8]


def test_tiny_net_shapes():
    net = M.build_network(M.tiny_test_blocks())
    params = M.init_params(net, jax.random.PRNGKey(0))
    x = jnp.zeros((2, 64, 64, 3))
    heads = jax.jit(lambda p, x: M.apply(net, p, x))(params, x)
    assert [h.shape for h in heads] == [
        (2, 2, 2, 60), (2, 4, 4, 60), (2, 8, 8, 60)]


def test_fold_bn_equivalence():
    net = M.build_network(M.tiny_test_blocks())
    key = jax.random.PRNGKey(1)
    params = M.init_params(net, key)
    # randomize BN stats so folding is non-trivial
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(2), len(leaves))
    params = jax.tree.unflatten(treedef, [
        l + 0.1 * jax.random.normal(k, l.shape) if l.ndim == 1 else l
        for l, k in zip(leaves, keys)])
    params = jax.tree.map(lambda l: jnp.abs(l) + 0.05 if l.ndim == 1 else l,
                          params)  # keep var positive
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3))
    heads_raw = M.apply(net, params, x)
    heads_folded = M.apply(net, M.fold_bn(net, params), x)
    for a, b in zip(heads_raw, heads_folded):
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_weights_io_roundtrip(tmp_path):
    net = M.build_network(M.tiny_test_blocks())
    params = M.init_params(net, jax.random.PRNGKey(4))
    path = tmp_path / "w.weights"
    M.save_darknet_weights(net, params, path)
    loaded, header = M.load_darknet_weights(net, path)
    assert header.tolist() == [0, 2, 0, 0, 0]
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 params, loaded)


def test_weights_io_detects_truncation(tmp_path):
    net = M.build_network(M.tiny_test_blocks())
    params = M.init_params(net, jax.random.PRNGKey(4))
    path = tmp_path / "w.weights"
    M.save_darknet_weights(net, params, path)
    data = path.read_bytes()
    path.write_bytes(data[:-64])
    with pytest.raises(ValueError):
        M.load_darknet_weights(net, path)


# ---------------------------------------------------------------------------
# Torch-oracle parity: validates conv padding, eval-BN, leaky, maxpool,
# upsample, route and shortcut semantics against torch's implementations.
# ---------------------------------------------------------------------------

TORCH_PARITY_CFG = """
[net]
width=32
height=32
channels=3

[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=8
size=1
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
activation=leaky

[shortcut]
from=-3
activation=linear

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=0
filters=8
size=1
stride=1
pad=1
activation=linear

[upsample]
stride=2

[route]
layers=-1, 4

[convolutional]
batch_normalize=1
filters=4
size=3
stride=1
pad=1
activation=mish
"""


def _torch_forward(blocks, params_np, x_nchw):
    import torch
    import torch.nn.functional as F

    torch.set_grad_enabled(False)
    x = torch.from_numpy(x_nchw)
    outputs = []
    conv_i = 0
    cur = x
    for i, block in enumerate(blocks[1:]):
        kind = block["type"]
        if kind == "convolutional":
            p = params_np[f"conv_{i}"]
            w = torch.from_numpy(np.ascontiguousarray(
                p["w"].transpose(3, 2, 0, 1)))  # HWIO -> OIHW
            size = int(block["size"])
            stride = int(block["stride"])
            pad = (size - 1) // 2
            bias = None if "gamma" in p else torch.from_numpy(p["b"])
            cur = F.conv2d(cur, w, bias, stride=stride, padding=pad)
            if "gamma" in p:
                cur = F.batch_norm(
                    cur, torch.from_numpy(p["mean"]),
                    torch.from_numpy(p["var"]),
                    torch.from_numpy(p["gamma"]),
                    torch.from_numpy(p["beta"]), training=False, eps=1e-5)
            act = block.get("activation", "linear")
            if act == "leaky":
                cur = F.leaky_relu(cur, 0.1)
            elif act == "mish":
                cur = cur * torch.tanh(F.softplus(cur))
            conv_i += 1
        elif kind == "maxpool":
            size, stride = int(block["size"]), int(block["stride"])
            if size == 2 and stride == 1:
                cur = F.pad(cur, (0, 1, 0, 1))
                cur = F.max_pool2d(cur, 2, 1)
            else:
                cur = F.max_pool2d(cur, size, stride, (size - 1) // 2)
        elif kind == "upsample":
            cur = F.interpolate(cur, scale_factor=int(block["stride"]),
                                mode="nearest")
        elif kind == "route":
            srcs = [(i + int(s)) if int(s) < 0 else int(s)
                    for s in block["layers"].split(",")]
            cur = torch.cat([outputs[s] for s in srcs], 1)
        elif kind == "shortcut":
            frm = int(block["from"])
            src = i + frm if frm < 0 else frm
            cur = outputs[i - 1] + outputs[src]
        outputs.append(cur)
    return cur.numpy()


def test_torch_parity(rng):
    blocks = M.parse_darknet_cfg(TORCH_PARITY_CFG)
    net = M.build_network(blocks)
    params = M.init_params(net, jax.random.PRNGKey(7))
    # randomize BN stats
    def jitter(p, key):
        out = dict(p)
        for k in ("gamma", "beta", "mean"):
            if k in out:
                key, sub = jax.random.split(key)
                out[k] = out[k] + 0.3 * jax.random.normal(sub, out[k].shape)
        if "var" in out:
            key, sub = jax.random.split(key)
            out["var"] = jnp.abs(out["var"] + 0.2 * jax.random.normal(
                sub, out["var"].shape)) + 0.01
        return out
    keys = jax.random.split(jax.random.PRNGKey(8), len(params))
    params = {name: jitter(p, k)
              for (name, p), k in zip(sorted(params.items()), keys)}

    x = rng.standard_normal((2, 32, 32, 3), dtype=np.float32)
    ours = M.apply(net, params, jnp.asarray(x))
    # final layer output is the last conv (no yolo blocks in this cfg)
    ours_final = np.asarray(ours[-1]) if ours else None
    params_np = jax.tree.map(np.asarray, params)
    theirs = _torch_forward(blocks, params_np, x.transpose(0, 3, 1, 2))
    # our net has no yolo layer -> apply returns []; recompute via manual walk
    # by calling apply with a yolo-terminated variant instead:
    blocks_y = blocks + [{"type": "yolo", "mask": "0,1,2",
                          "anchors": M.DOTA_ANCHORS, "classes": "15"}]
    net_y = M.build_network(blocks_y)
    ours_heads = M.apply(net_y, params, jnp.asarray(x))
    ours_final = np.asarray(ours_heads[0]).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours_final, theirs, atol=1e-4, rtol=1e-4)


def _torch_forward_heads(blocks, params_np, x_nchw):
    """Torch-oracle full-network walk collecting raw yolo heads."""
    import torch
    torch.set_grad_enabled(False)
    outputs, heads = [], []
    cur = torch.from_numpy(x_nchw)
    for i, block in enumerate(blocks[1:]):
        kind = block["type"]
        if kind == "convolutional":
            import torch.nn.functional as F
            p = params_np[f"conv_{i}"]
            w = torch.from_numpy(np.ascontiguousarray(
                p["w"].transpose(3, 2, 0, 1)))
            size, stride = int(block["size"]), int(block["stride"])
            bias = None if "gamma" in p else torch.from_numpy(p["b"])
            cur = F.conv2d(cur, w, bias, stride=stride,
                           padding=(size - 1) // 2)
            if "gamma" in p:
                cur = F.batch_norm(
                    cur, torch.from_numpy(p["mean"]),
                    torch.from_numpy(p["var"]),
                    torch.from_numpy(p["gamma"]),
                    torch.from_numpy(p["beta"]), training=False, eps=1e-5)
            if block.get("activation") == "leaky":
                cur = torch.nn.functional.leaky_relu(cur, 0.1)
        elif kind == "upsample":
            cur = torch.nn.functional.interpolate(
                cur, scale_factor=int(block["stride"]), mode="nearest")
        elif kind == "route":
            srcs = [(i + int(s)) if int(s) < 0 else int(s)
                    for s in block["layers"].split(",")]
            cur = torch.cat([outputs[s] for s in srcs], 1)
        elif kind == "shortcut":
            frm = int(block["from"])
            cur = outputs[i - 1] + outputs[i + frm if frm < 0 else frm]
        elif kind == "yolo":
            heads.append(cur.numpy())
        outputs.append(cur)
    return heads


@pytest.mark.slow
def test_full_yolov3_forward_torch_parity(tmp_path, rng):
    """The full 75-conv yolov3-dota graph (random weights, round-tripped
    through the darknet binary format) matches a torch oracle at every
    head, at 160x160 input."""
    blocks = M.yolov3_blocks(width=160, height=160)
    net = M.build_network(blocks)
    params = M.init_params(net, jax.random.PRNGKey(42))
    # randomize BN stats so folding and the loader are non-trivial
    def jitter(p, key):
        out = dict(p)
        for k in ("gamma", "beta", "mean"):
            if k in out:
                key, sub = jax.random.split(key)
                out[k] = out[k] + 0.2 * jax.random.normal(sub, out[k].shape)
        if "var" in out:
            key, sub = jax.random.split(key)
            out["var"] = jnp.abs(out["var"] + 0.1 * jax.random.normal(
                sub, out["var"].shape)) + 0.05
        return out
    keys = jax.random.split(jax.random.PRNGKey(43), len(params))
    params = {name: jitter(p, k)
              for (name, p), k in zip(sorted(params.items()), keys)}
    # damp kernels so activations stay O(1) through 75 random layers
    # (unnormalized residual stacks otherwise amplify float-assoc noise)
    params = {name: {k: v * 0.55 if k == "w" else v
                     for k, v in p.items()}
              for name, p in params.items()}

    # round-trip through the darknet binary format
    wpath = tmp_path / "rt.weights"
    M.save_darknet_weights(net, params, wpath)
    params_rt, _ = M.load_darknet_weights(net, wpath)

    x = rng.standard_normal((1, 160, 160, 3), dtype=np.float32) * 0.5
    ours = M.apply(net, params_rt, jnp.asarray(x))
    ours_folded = M.apply(net, M.fold_bn(net, params_rt), jnp.asarray(x))

    params_np = jax.tree.map(np.asarray, params_rt)
    theirs = _torch_forward_heads(blocks, params_np,
                                  x.transpose(0, 3, 1, 2))
    assert len(ours) == len(theirs) == 3
    for o, of, t in zip(ours, ours_folded, theirs):
        o = np.asarray(o).transpose(0, 3, 1, 2)
        of = np.asarray(of).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(o, t, atol=2e-3, rtol=1e-3)
        np.testing.assert_allclose(of, t, atol=5e-3, rtol=2e-3)


def test_describe_network():
    net = M.build_network(M.yolov3_blocks())
    table = M.describe_network(net)
    assert "yolo mask=6,7,8" in table
    assert "608x608" not in table.split("\n")[0]
    # darknet53+head conv parameter count is ~61.6M for 15 classes
    total = int(table.rsplit(":", 1)[1].replace(",", ""))
    assert 61_000_000 < total < 62_500_000
    lines = table.split("\n")
    assert len(lines) == 107 + 2  # 107 layers + header + total


def test_packed_stem_exactness(rng):
    """Space-to-depth stem == plain first-two-conv evaluation."""
    from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.experimental.packed_stem import (
        packed_stem_apply, stem_applicable)
    blocks = M.yolov3_blocks(width=64, height=64)
    net = M.build_network(blocks)
    assert stem_applicable(net)
    params = M.fold_bn(net, M.init_params(net, jax.random.PRNGKey(9)))
    # damp kernels so activations stay O(1) (random unnormalized residual
    # stacks otherwise amplify float-reassociation noise; cf. the full
    # parity test)
    params = {n: {k: v * 0.55 if k == "w" else v for k, v in p.items()}
              for n, p in params.items()}
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3), np.float32))
    heads_plain = M.apply(net, params, x, packed_stem=False)
    heads_packed = M.apply(net, params, x, packed_stem=True)
    for a, b in zip(heads_plain, heads_packed):
        # random unnormalized nets amplify reassociation noise; the
        # direct stem comparison below is the tight check
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=5e-4)
    # direct stem-output comparison
    from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.models.darknet import _conv_layer
    y_plain = _conv_layer(
        _conv_layer(x, net.layers[0].conv, params["conv_0"], jnp.float32),
        net.layers[1].conv, params["conv_1"], jnp.float32)
    y_packed = packed_stem_apply(
        x, net.layers[0].conv, params["conv_0"],
        net.layers[1].conv, params["conv_1"], jnp.float32)
    np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_plain),
                               atol=1e-5, rtol=1e-5)


def test_packed_stem_skipped_for_unfolded_params():
    net = M.build_network(M.yolov3_blocks(width=64, height=64))
    params = M.init_params(net, jax.random.PRNGKey(3))  # BN not folded
    x = jnp.zeros((1, 64, 64, 3))
    heads = M.apply(net, params, x, packed_stem=True)   # falls back
    assert heads[0].shape == (1, 2, 2, 60)


def test_yolov3_structural_golden():
    """Golden pin of the programmatic yolov3-dota spec: per-layer param
    shapes and the layer table must not drift (SURVEY §4: golden-file
    tests for cfg parsing / weight loading)."""
    import hashlib
    net = M.build_network(M.yolov3_blocks())
    spec_lines = [
        f"{s.index}:{s.in_ch}->{s.filters} k{s.size} s{s.stride} "
        f"bn{int(s.bn)} {s.activation}" for s in M.conv_specs(net)]
    digest = hashlib.sha256("\n".join(spec_lines).encode()).hexdigest()
    assert digest == (
        "6bcb83c923c242d179f93cd887270151bc245825ddeeda0e99ba9cb60bb198f4")
    # total parameter count pinned (61,651,732 for classes=15)
    total = sum(
        s.size * s.size * s.in_ch * s.filters
        + (4 * s.filters if s.bn else s.filters)
        for s in M.conv_specs(net))
    assert total == 61651732


@pytest.mark.slow  # interpret-mode planar chain, ~60s on one core
def test_planar_stem_non_yolov3_channels(rng, monkeypatch):
    """Regression: stem_applicable admits any channel ladder with the
    right geometry (tiny_test_blocks: cout 32, not yolov3's 128), but
    planar_stem once hardcoded cout=128 at the output boundary — on the
    MXU-layout path that crashed the kernel (observed in
    tools/warp_dtype_ab.py on TPU), on the jnp path it silently sliced.
    The planar stem must equal the plain conv walk for such nets."""
    import functools
    from adversarial_patch_based_false_positive_creation_attacks_against_aerial_imagery_object_detectors_tpu.models import (
        stem_planar)
    monkeypatch.setattr(stem_planar, "_forward",
                        functools.partial(stem_planar._forward,
                                          interpret=True))
    net = M.build_network(M.tiny_test_blocks(width=64, height=64))
    params = M.fold_bn(net, M.init_params(net, jax.random.PRNGKey(3)))
    assert stem_planar.stem_applicable(net, params, (2, 64, 64, 3))
    x = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    want = M.apply(net, params, x, jnp.float32,
                   planar_stem=False, fused_stem=False)
    got = M.apply(net, params, x, jnp.float32,
                  planar_stem=True, fused_stem=False)
    for w, g in zip(want, got):
        assert w.shape == g.shape
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-4, rtol=2e-4)
