"""Checkpoint save/load (ref: src/checkpoint.zig:23-112).

Same capability as the reference's `ZGML` binary param dump — magic, version,
named param list with shape verification on load — generalized to arbitrary
pytrees (flattened with '/'-joined key paths) and extended with optimizer-state
checkpointing, which the reference lacks (SURVEY.md §5).

Format: [magic 'ZGMT'][version u32][n u64] then per entry:
  [name_len u16][name utf8][dtype_len u8][dtype str][ndim u8][dims u64...]
  [nbytes u64][raw little-endian data]
"""
from __future__ import annotations

import struct
from typing import Any

import jax
import numpy as np

MAGIC = b"ZGMT"
VERSION = 1


def _flatten(tree) -> list[tuple[str, np.ndarray]]:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path)
        out.append((name, np.asarray(leaf)))
    return out


def save_checkpoint(path: str, tree: Any):
    entries = _flatten(tree)
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<IQ", VERSION, len(entries)))
        for name, arr in entries:
            nb = name.encode()
            dt = arr.dtype.str.encode()   # e.g. '<f4'
            f.write(struct.pack("<H", len(nb)) + nb)
            f.write(struct.pack("<B", len(dt)) + dt)
            f.write(struct.pack("<B", arr.ndim))
            for d in arr.shape:
                f.write(struct.pack("<Q", d))
            raw = np.ascontiguousarray(arr).tobytes()
            f.write(struct.pack("<Q", len(raw)))
            f.write(raw)


def load_checkpoint(path: str, like: Any) -> Any:
    """Load into the structure of `like`, verifying names and shapes
    (ref: shape verification, checkpoint.zig:60-112)."""
    with open(path, "rb") as f:
        if f.read(4) != MAGIC:
            raise ValueError("bad checkpoint magic")
        version, n = struct.unpack("<IQ", f.read(12))
        if version != VERSION:
            raise ValueError(f"unsupported checkpoint version {version}")
        loaded: dict[str, np.ndarray] = {}
        for _ in range(n):
            (nlen,) = struct.unpack("<H", f.read(2))
            name = f.read(nlen).decode()
            (dlen,) = struct.unpack("<B", f.read(1))
            dtype = np.dtype(f.read(dlen).decode())
            (ndim,) = struct.unpack("<B", f.read(1))
            shape = tuple(struct.unpack("<Q", f.read(8))[0] for _ in range(ndim))
            (nbytes,) = struct.unpack("<Q", f.read(8))
            arr = np.frombuffer(f.read(nbytes), dtype).reshape(shape)
            loaded[name] = arr

    expect = _flatten(like)
    if len(expect) != len(loaded):
        raise ValueError(f"checkpoint has {len(loaded)} params, "
                         f"model expects {len(expect)}")
    leaves = []
    for name, arr in expect:
        if name not in loaded:
            raise KeyError(f"checkpoint missing param {name!r}")
        got = loaded[name]
        if got.shape != arr.shape:
            raise ValueError(f"shape mismatch for {name}: "
                             f"{got.shape} vs {arr.shape}")
        leaves.append(jax.numpy.asarray(got))
    _, treedef = jax.tree_util.tree_flatten(like)
    return jax.tree_util.tree_unflatten(treedef, leaves)
