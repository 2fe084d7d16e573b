#!/usr/bin/env python
"""Generate the reference-parity golden fixture (tests/fixtures/refparity).

Runs the PUBLIC reference implementation at /root/reference (read-only,
executed — never copied) on CPU torch to produce:

  mini_yolov3_dota.cfg      - a 14-block mini YOLOv3 (3 heads at strides
                              32/16/8, 15 DOTA classes, 320^2 input)
  mini_yolov3_dota.weights  - darknet binary checkpoint written by the
                              reference's own Darknet.save_darknet_weights
                              (darknet_v3.py:283), after deterministic
                              torch training on synthetic box scenes (so
                              weights + BN running stats carry *trained*
                              statistics, not random init)
  tile_{0,1,2}.png          - held-out golden tiles
  golden_boxes.json         - reference utils.do_detect (utils.py:450-519)
                              outputs on each tile at (conf 0.4, nms 0.4)
                              and (conf 0.01, nms 0.4), incl. the
                              get_anchors group-reversal quirk

The committed artifacts let tests/test_refparity.py pin our full
load -> forward -> decode -> NMS chain against the reference's box
outputs within 1e-3 WITHOUT needing /root/reference or torch at test
time. Regenerate with:  python tools/make_refparity_fixture.py
"""
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tests", "fixtures", "refparity")
REF = "/root/reference"

IMG = 320
STRIDES = (32, 16, 8)
NUM_CLASSES = 15
STEPS = 800  # enough to push background obj well below the 0.01 sweep
BATCH = 8

# Mini YOLOv3: same structural vocabulary as cfg/yolov3-dota.cfg (conv
# bn/leaky, stride-2 downsamples, linear no-BN head convs, route, yolo
# with the dota anchor list), 3 heads emitted in stride order 32/16/8.
ANCHORS = ("15, 31,  19, 12,  28, 40,  48, 24,  37, 63,  76, 42,"
           "  62,109,  140, 80,  209,169")
MINI_CFG = f"""[net]
batch={BATCH}
subdivisions=1
width={IMG}
height={IMG}
channels=3
momentum=0.9
decay=0.0005
learning_rate=0.001
burn_in=100
max_batches=1000
policy=steps
steps=400,450
scales=.1,.1

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
filters=32
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=32
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=48
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=64
size=3
stride=2
pad=1
activation=leaky

[convolutional]
# no batch_normalize line: the reference saver truth-tests the RAW
# string ("0" is truthy, darknet_v3.py:297), so rely on the parser's
# int-0 default (cfg.py:50-51) like the real yolov3-dota.cfg head convs
filters=60
size=1
stride=1
pad=1
activation=linear

[yolo]
mask = 6,7,8
anchors = {ANCHORS}
classes=15
num=9

[route]
layers = 4

[convolutional]
# no batch_normalize line: the reference saver truth-tests the RAW
# string ("0" is truthy, darknet_v3.py:297), so rely on the parser's
# int-0 default (cfg.py:50-51) like the real yolov3-dota.cfg head convs
filters=60
size=1
stride=1
pad=1
activation=linear

[yolo]
mask = 3,4,5
anchors = {ANCHORS}
classes=15
num=9

[route]
layers = 3

[convolutional]
# no batch_normalize line: the reference saver truth-tests the RAW
# string ("0" is truthy, darknet_v3.py:297), so rely on the parser's
# int-0 default (cfg.py:50-51) like the real yolov3-dota.cfg head convs
filters=60
size=1
stride=1
pad=1
activation=linear

[yolo]
mask = 0,1,2
anchors = {ANCHORS}
classes=15
num=9
"""

# deterministic 15-color class palette (visually distinct-ish)
def _palette(rng):
    return rng.integers(30, 226, size=(NUM_CLASSES, 3))


def make_scene(rng, palette):
    """320^2 uint8 scene: noisy gray background + colored rectangles.
    Returns (img_u8, boxes) with boxes = [(cx, cy, w, h, cls), ...] px."""
    img = np.full((IMG, IMG, 3), 127, np.float32)
    img += rng.normal(0, 3, size=(IMG, IMG, 1))  # luma noise
    img += rng.uniform(-12, 12)                  # global brightness
    boxes = []
    for _ in range(int(rng.integers(1, 4))):
        w = float(np.exp(rng.uniform(np.log(12), np.log(180))))
        h = float(np.exp(rng.uniform(np.log(12), np.log(180))))
        cx = float(rng.uniform(w / 2 + 2, IMG - w / 2 - 2))
        cy = float(rng.uniform(h / 2 + 2, IMG - h / 2 - 2))
        cls = int(rng.integers(0, NUM_CLASSES))
        x0, x1 = int(cx - w / 2), int(cx + w / 2)
        y0, y1 = int(cy - h / 2), int(cy + h / 2)
        img[y0:y1, x0:x1] = palette[cls] + rng.normal(0, 2)
        boxes.append((cx, cy, w, h, cls))
    return np.clip(img, 0, 255).astype(np.uint8), boxes


def build_targets(torch, boxes_batch, anchors_groups):
    """Simplified YOLO targets on the raw heads: per box, the single
    best (scale, anchor) cell gets obj=1 + class + box-coord targets
    (decode math of reference utils.get_region_boxes:125-245)."""
    grids = [IMG // s for s in STRIDES]
    obj_t = [torch.zeros(BATCH, 3, g, g) for g in grids]
    pos = [[] for _ in STRIDES]  # (b, a, gy, gx, fx, fy, tw, th, cls)
    for b, boxes in enumerate(boxes_batch):
        for (cx, cy, w, h, cls) in boxes:
            best, best_d = None, 1e9
            for i in range(3):
                for a in range(3):
                    aw, ah = anchors_groups[i][a]
                    d = np.log(w / aw) ** 2 + np.log(h / ah) ** 2
                    if d < best_d:
                        best, best_d = (i, a), d
            i, a = best
            stride, g = STRIDES[i], grids[i]
            gx = min(int(cx / stride), g - 1)
            gy = min(int(cy / stride), g - 1)
            obj_t[i][b, a, gy, gx] = 1.0
            aw, ah = anchors_groups[i][a]
            pos[i].append((b, a, gy, gx, cx / stride - gx,
                           cy / stride - gy, np.log(w / aw),
                           np.log(h / ah), cls))
    return obj_t, pos


def main():
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "mini_yolov3_dota.cfg"), "w") as f:
        f.write(MINI_CFG)

    sys.path.insert(0, REF)
    os.chdir(REF)  # utils.do_detect reads data/... relative paths
    import types
    if "torchvision" not in sys.modules:
        # not installed here; reference utils.py only touches it inside
        # non_max_suppression (utils.py:715), which do_detect never calls
        sys.modules["torchvision"] = types.ModuleType("torchvision")
    import torch  # noqa: E402
    # the reference decode hardcodes .cuda() on its grid/anchor tensors
    # (utils.py:151-166) regardless of do_detect's use_cuda flag; make
    # .cuda a no-op so the whole chain runs on CPU torch
    torch.Tensor.cuda = lambda self, *a, **k: self
    from darknet_v3 import Darknet
    from utils import do_detect, get_anchors

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 4)
    rng = np.random.default_rng(0)
    palette = _palette(np.random.default_rng(7))

    model = Darknet(os.path.join(OUT, "mini_yolov3_dota.cfg"))
    assert model.height == IMG
    anchors_groups = get_anchors("data/yolov3_anchors.txt")  # quirk incl.

    weights_path = os.path.join(OUT, "mini_yolov3_dota.weights")
    if "--reuse-weights" in sys.argv and os.path.exists(weights_path):
        # resume: the reference 0.01-conf sweep (python NMS) dominates
        # runtime; don't redo the training when iterating on tiles
        model.load_darknet_weights(weights_path)
        model.eval()
        return finish(model, do_detect, _palette(np.random.default_rng(7)))

    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    bce = torch.nn.BCEWithLogitsLoss(pos_weight=torch.tensor(30.0))
    ce = torch.nn.CrossEntropyLoss()
    model.train()
    for step in range(STEPS):
        imgs, boxes_batch = [], []
        for _ in range(BATCH):
            img, boxes = make_scene(rng, palette)
            imgs.append(img.astype(np.float32) / 255.0)
            boxes_batch.append(boxes)
        x = torch.from_numpy(
            np.stack(imgs).transpose(0, 3, 1, 2)).contiguous()
        heads = model(x)  # [B,60,S,S] x3, raw
        obj_t, pos = build_targets(torch, boxes_batch, anchors_groups)
        loss = 0.0
        for i, head in enumerate(heads):
            g = head.shape[-1]
            h5 = head.view(BATCH, 3, 20, g, g)
            loss = loss + bce(h5[:, :, 4], obj_t[i])
            if pos[i]:
                bs, as_, gys, gxs, fxs, fys, tws, ths, cls = map(
                    list, zip(*pos[i]))
                sel = h5[bs, as_, :, gys, gxs]  # [P, 20]
                fx = torch.tensor(fxs, dtype=torch.float32)
                fy = torch.tensor(fys, dtype=torch.float32)
                tw = torch.tensor(tws, dtype=torch.float32)
                th = torch.tensor(ths, dtype=torch.float32)
                loss = loss + ((torch.sigmoid(sel[:, 0]) - fx) ** 2
                               + (torch.sigmoid(sel[:, 1]) - fy) ** 2
                               + 0.2 * (sel[:, 2] - tw) ** 2
                               + 0.2 * (sel[:, 3] - th) ** 2).mean()
                loss = loss + ce(sel[:, 5:20], torch.tensor(cls))
        opt.zero_grad()
        loss.backward()
        opt.step()
        if step % 50 == 0:
            print(f"step {step}: loss {float(loss):.4f}", flush=True)

    model.eval()
    # reference bug: save_darknet_weights reads self.module_defs
    # (darknet_v3.py:293) but __init__ only ever sets self.blocks
    # (darknet_v3.py:184) — alias it so their saver runs as intended
    model.module_defs = model.blocks
    model.save_darknet_weights(os.path.join(OUT, "mini_yolov3_dota.weights"))
    finish(model, do_detect, palette)


def prenms_boxes(model, pil, conf):
    """do_detect's decode pipeline (utils.py:450-515) stopped just
    before the final nms() call: PIL->tensor, forward, per-scale
    get_region_boxes with the quirk-paired anchors, /w /h normalization.
    Pre-NMS candidates are tie-free golden data — the reference's greedy
    NMS breaks equal-confidence ties by sort order, which is not stable
    across frameworks' last-ulp conv differences."""
    import torch
    from utils import get_anchors, get_region_boxes
    w, h = pil.width, pil.height
    img = torch.ByteTensor(torch.ByteStorage.from_buffer(pil.tobytes()))
    img = img.view(h, w, 3).transpose(0, 1).transpose(0, 2).contiguous()
    img = img.view(1, 3, h, w).float().div(255.0)
    with torch.no_grad():
        outputs = model.forward(img)
    anchors = get_anchors("data/yolov3_anchors.txt")
    rows = []
    for i in range(len(anchors)):
        boxes = get_region_boxes(outputs[i], conf, NUM_CLASSES,
                                 anchors[i], len(anchors), (w, h))[0]
        for b in boxes:
            rows.append([float(b[0]) / w, float(b[1]) / h,
                         float(b[2]) / w, float(b[3]) / h]
                        + [float(v) for v in b[4:]])
    return rows


def finish(model, do_detect, palette):
    """Golden tiles + reference do_detect sweeps, written incrementally
    (the reference's pure-python conf-0.01 NMS takes minutes per tile)."""
    from PIL import Image
    json_path = os.path.join(OUT, "golden_boxes.json")
    golden = {}
    if os.path.exists(json_path):
        with open(json_path) as f:
            golden = json.load(f)["tiles"]

    def save():
        with open(json_path, "w") as f:
            json.dump({"img_size": IMG, "num_classes": NUM_CLASSES,
                       "nms_thresh": 0.4, "tiles": golden}, f, indent=1)

    grng = np.random.default_rng(1234)
    for t in range(3):
        img_u8, _ = make_scene(grng, palette)  # rng stream fixed per t
        name = f"tile_{t}.png"
        png = os.path.join(OUT, name)
        if not os.path.exists(png):
            Image.fromarray(img_u8).save(png)
        pil = Image.open(png).convert("RGB")
        entry = golden.setdefault(name, {})
        if "prenms001" not in entry:
            rows = prenms_boxes(model, pil, 0.01)
            entry["prenms001"] = rows
            print(f"{name} prenms001: {len(rows)} boxes", flush=True)
            save()
        for key, conf in (("conf04", 0.4), ("conf001", 0.01)):
            if key in entry:
                continue
            boxes = do_detect(model, pil, conf, 0.4, use_cuda=0)
            entry[key] = [[float(v) for v in b] for b in boxes]
            print(f"{name} {key}: {len(boxes)} boxes", flush=True)
            save()
    print("fixture written to", OUT)


if __name__ == "__main__":
    main()
