"""Checkpointing and patch image export.

The reference checkpoints only the patch PNG every 20 epochs
(train_patch.py:367-376) and cannot resume optimizer state. Here a full
(state, epoch, scheduler) checkpoint goes to a single ``.npz`` (flattened
pytree, no pickle), alongside the PNG export and the adjacent-patch-MSE
convergence probe (utils_self.patch_MSE_calsulator parity: MSE between
the *quantized* saved images)."""

from __future__ import annotations

import json
from typing import Any, Dict, Tuple

import jax
import numpy as np
from PIL import Image


def save_patch_png(patch: np.ndarray, path: str) -> None:
    """patch [P, P, 3] float in [0,1] -> 8-bit PNG. Uses truncation
    (torchvision ToPILImage semantics: mul(255).byte())."""
    arr = np.clip(np.asarray(patch) * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def load_patch_png(path: str, patch_size: int | None = None) -> np.ndarray:
    """PNG -> [P, P, 3] float32 in [0,1]; optional bilinear resize
    (read_image / PatchTrainer.read_image parity)."""
    img = Image.open(path).convert("RGB")
    if patch_size is not None and img.size != (patch_size, patch_size):
        img = img.resize((patch_size, patch_size), Image.BILINEAR)
    return np.asarray(img, dtype=np.float32) / 255.0


def patch_png_mse(path_a: str, path_b: str) -> float:
    a = load_patch_png(path_a)
    b = load_patch_png(path_b)
    return float(np.mean((a - b) ** 2))


def save_checkpoint(path: str, state: Any, epoch: int,
                    scheduler: Dict[str, float]) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    payload = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    payload["meta"] = np.frombuffer(json.dumps({
        "epoch": epoch, "scheduler": scheduler,
        "n_leaves": len(leaves)}).encode(), dtype=np.uint8)
    np.savez(path, **payload)


def restore_checkpoint(path: str, state_template: Any
                       ) -> Tuple[Any, int, Dict[str, float]]:
    data = np.load(path)
    meta = json.loads(bytes(data["meta"]).decode())
    leaves = [data[f"leaf_{i}"] for i in range(meta["n_leaves"])]
    treedef = jax.tree_util.tree_structure(state_template)
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    return state, int(meta["epoch"]), meta["scheduler"]
