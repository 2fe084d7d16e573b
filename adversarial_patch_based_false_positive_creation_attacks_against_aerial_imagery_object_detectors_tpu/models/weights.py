"""Darknet binary weight I/O and checkpoint helpers.

The darknet ``.weights`` format (consumed/produced by the reference's
``darknet_v3.py:223-309``): a 5-int32 header (major, minor, revision, seen,
pad) followed by a flat float32 stream. Per convolutional layer, in block
order:

- with batch-norm:   bn_bias(beta), bn_weight(gamma), running_mean,
  running_var, then conv kernel in OIHW order;
- without batch-norm: conv bias, then conv kernel (OIHW).

We transpose OIHW -> HWIO on load (TPU conv layout) and back on save, so a
round-trip is bit-exact.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from .darknet import Network, Params, conv_specs


def load_darknet_weights(net: Network, path: str | os.PathLike,
                         dtype=jnp.float32) -> Tuple[Params, np.ndarray]:
    """Read a darknet ``.weights`` file into a params tree.

    Returns ``(params, header)``; ``header`` is the 5-int32 file header.
    """
    with open(path, "rb") as f:
        header = np.fromfile(f, dtype=np.int32, count=5)
        buf = np.fromfile(f, dtype=np.float32)

    ptr = 0

    def take(n: int) -> np.ndarray:
        nonlocal ptr
        out = buf[ptr:ptr + n]
        if out.size != n:
            raise ValueError(
                f"weight file truncated: needed {n} floats at offset {ptr}, "
                f"file has {buf.size}")
        ptr += n
        return out

    params: Params = {}
    for spec in conv_specs(net):
        p: Dict[str, jnp.ndarray] = {}
        if spec.bn:
            p["beta"] = jnp.asarray(take(spec.filters), dtype)
            p["gamma"] = jnp.asarray(take(spec.filters), dtype)
            p["mean"] = jnp.asarray(take(spec.filters), dtype)
            p["var"] = jnp.asarray(take(spec.filters), dtype)
        else:
            p["b"] = jnp.asarray(take(spec.filters), dtype)
        n_w = spec.filters * spec.in_ch * spec.size * spec.size
        w_oihw = take(n_w).reshape(
            spec.filters, spec.in_ch, spec.size, spec.size)
        p["w"] = jnp.asarray(w_oihw.transpose(2, 3, 1, 0), dtype)  # -> HWIO
        params[f"conv_{spec.index}"] = p

    if ptr != buf.size:
        raise ValueError(
            f"weight file has {buf.size - ptr} unread floats "
            "(architecture mismatch?)")
    return params, header


def save_darknet_weights(net: Network, params: Params,
                         path: str | os.PathLike,
                         header: np.ndarray | None = None) -> None:
    """Write params to the darknet binary format (inverse of the loader)."""
    if header is None:
        header = np.array([0, 2, 0, 0, 0], dtype=np.int32)
    chunks = [np.asarray(header, dtype=np.int32).tobytes()]
    for spec in conv_specs(net):
        p = params[f"conv_{spec.index}"]
        if spec.bn:
            for k in ("beta", "gamma", "mean", "var"):
                chunks.append(np.asarray(p[k], np.float32).tobytes())
        else:
            chunks.append(np.asarray(p["b"], np.float32).tobytes())
        w_oihw = np.asarray(p["w"], np.float32).transpose(3, 2, 0, 1)
        chunks.append(np.ascontiguousarray(w_oihw).tobytes())
    with open(path, "wb") as f:
        f.write(b"".join(chunks))
