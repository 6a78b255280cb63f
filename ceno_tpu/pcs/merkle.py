"""Poseidon2 Merkle trees over codeword matrices.

Device side builds leaf digests (sponge over each row's C column values) and
all compression levels in one jitted program; digest levels are pulled to host
once per commit for path extraction (the query phase is host-side, like the
verifier). Leaf VALUES stay on device — query rows are gathered by a jitted
program and only (C, n_queries) values cross the wire.

Mirrors the Merkle layer of the reference's Basefold commitment (SURVEY.md
§2.9 mpcs crate).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import babybear as bb
from ..hash import poseidon2 as p2
from ..utils import aotcache as aot


@aot.jit
def _hash_and_tree_scan(cols):
    """cols (C, M) Monty -> (leaf_digests (8, M), levels tuple of (8, m)).

    lax.scan-round permutations: every round is a full HBM pass over the
    state. Portable (CPU mesh dryruns, GSPMD sharding); the TPU hot path
    is the fused pallas variant below."""
    c, m = cols.shape
    state = jnp.zeros((p2.WIDTH, m), bb.DTYPE)
    for off in range(0, max(c, 1), p2.RATE):
        chunk = cols[off : off + p2.RATE]
        state = state.at[: chunk.shape[0]].set(
            bb.add(state[: chunk.shape[0]], chunk)
        )
        state = p2.permute_device(state)
    leaves = state[: p2.DIGEST_ELEMS]
    levels = []
    cur = leaves
    while cur.shape[1] > 1:
        half = cur.shape[1] // 2
        pairs = cur.reshape(p2.DIGEST_ELEMS, half, 2)
        st = jnp.concatenate([pairs[:, :, 0], pairs[:, :, 1]], axis=0)
        cur = p2.permute_device(st)[: p2.DIGEST_ELEMS]
        levels.append(cur)
    return leaves, tuple(levels)


@aot.jit
def _hash_and_tree_pallas(cols):
    """TPU hot path: the fused pallas leaf sponge + level compressions
    (hash/poseidon2_pallas.py) — one VMEM-resident pass per tile instead
    of 21 HBM round-trips per permutation. Byte-identical to the scan
    path (tests/test_poseidon2.py)."""
    from ..hash import poseidon2_pallas as pp

    leaves = pp.leaf_sponge(cols)
    levels = []
    cur = leaves
    while cur.shape[1] > 1:
        cur = pp.compress_level(cur)
        levels.append(cur)
    return leaves, tuple(levels)


def _use_pallas(m: int) -> bool:
    import os

    if os.environ.get("CENO_TPU_NO_PALLAS"):
        return False
    from ..hash.poseidon2_pallas import TILE

    try:
        backend = jax.default_backend()
    except Exception:
        return False
    return backend == "tpu" and m % TILE == 0


def hash_and_tree(cols):
    """cols (C, M) Monty -> (leaf_digests (8, M), levels tuple of (8, m))."""
    if _use_pallas(cols.shape[1]):
        return _hash_and_tree_pallas(cols)
    return _hash_and_tree_scan(cols)


@aot.jit(static_argnames=())
def gather_rows(cols, idx):
    """cols (C, M), idx (Q,) int32 -> (C, Q) Monty values."""
    return cols[:, idx]


def host_hash_leaves(cols: np.ndarray) -> np.ndarray:
    """Host mirror: cols (C, M) canonical -> (8, M) canonical digests."""
    c, m = cols.shape
    state = np.zeros((p2.WIDTH, m), np.uint64)
    for off in range(0, max(c, 1), p2.RATE):
        chunk = cols[off : off + p2.RATE]
        state[: chunk.shape[0]] = (state[: chunk.shape[0]] + chunk) % np.uint64(bb.P)
        state = p2.permute_host(state)
    return state[: p2.DIGEST_ELEMS]


def host_build_levels(leaves: np.ndarray) -> list:
    levels = []
    cur = leaves
    while cur.shape[1] > 1:
        half = cur.shape[1] // 2
        pairs = cur.reshape(p2.DIGEST_ELEMS, half, 2)
        st = np.concatenate([pairs[:, :, 0], pairs[:, :, 1]], axis=0)
        cur = p2.permute_host(st)[: p2.DIGEST_ELEMS]
        levels.append(cur)
    return levels


@aot.jit
def _root_slice(level):
    return level[:, 0]


@dataclass
class MerkleTree:
    """Digest data for one committed matrix.

    Host trees keep canonical digest levels; DEVICE trees are LAZY: only
    the root crosses the tunnel at build time, the digest levels stay on
    device, and query paths are extracted with ONE batched gather over a
    flattened digest array (a full-tree fetch costs seconds of tunnel
    transfer per commitment; the paths actually needed are a few KB)."""

    leaf_digests: np.ndarray  # (8, M) canonical, None for lazy device trees
    levels: list              # [(8, M/2), ..., (8, 1)] canonical, or None
    root: np.ndarray          # (8,) canonical
    dev_leaves: object = None
    dev_levels: tuple = None
    _flat: object = None      # lazily-built (8, total) device concat
    _offs: list = None

    @staticmethod
    def from_device(leaves_dev, levels_dev) -> "MerkleTree":
        root_dev = _root_slice(levels_dev[-1] if levels_dev else leaves_dev)
        root = bb.np_from_monty(np.asarray(root_dev)).astype(np.uint64)
        return MerkleTree(None, None, root, leaves_dev, tuple(levels_dev))

    @staticmethod
    def build_host(cols_canonical: np.ndarray) -> "MerkleTree":
        leaves = host_hash_leaves(cols_canonical)
        levels = host_build_levels(leaves)
        root = levels[-1][:, 0] if levels else leaves[:, 0]
        return MerkleTree(leaves, levels, root)

    def open_path(self, index: int) -> np.ndarray:
        """Sibling digests bottom-up: (depth, 8) canonical."""
        return self.open_paths([index])[0]

    def open_paths(self, indices) -> np.ndarray:
        """Batched sibling extraction: (Q, depth, 8) canonical."""
        if self.leaf_digests is not None:
            out = []
            arrs = (
                [self.leaf_digests] + self.levels[:-1]
                if self.levels else [self.leaf_digests]
            )
            for index in indices:
                sibs = []
                idx = index
                for arr in arrs:
                    sibs.append(arr[:, idx ^ 1].copy())
                    idx >>= 1
                out.append(np.stack(sibs) if sibs else np.zeros((0, 8), np.uint64))
            return np.stack(out)
        arrs = [self.dev_leaves] + list(self.dev_levels[:-1]) \
            if self.dev_levels else [self.dev_leaves]
        if self._flat is None:
            offs = []
            off = 0
            for a in arrs:
                offs.append(off)
                off += a.shape[1]
            self._flat = jnp.concatenate(arrs, axis=1)
            self._offs = offs
        flat_idx = []
        for index in indices:
            idx = index
            for off in self._offs:
                flat_idx.append(off + (idx ^ 1))
                idx >>= 1
        vals = gather_rows(self._flat, jnp.asarray(flat_idx, jnp.int32))
        vals = bb.np_from_monty(np.asarray(vals)).astype(np.uint64)  # (8, Q*d)
        depth = len(self._offs)
        return vals.T.reshape(len(indices), depth, 8)


def verify_paths(
    root: np.ndarray,
    indices,
    leaf_values: np.ndarray,
    paths: np.ndarray,
) -> bool:
    """Batched membership check: Q paths verified with ONE Poseidon2 batch per
    tree level (the per-query loop costs ~1ms/permute in numpy overhead alone).

    indices: (Q,) leaf positions; leaf_values: (Q, C) canonical row values;
    paths: (Q, depth, 8) sibling digests bottom-up."""
    q = len(indices)
    if q == 0:
        return True
    cur = host_hash_leaves(np.asarray(leaf_values, np.uint64).T)  # (8, Q)
    idx = np.asarray(indices, np.int64).copy()
    depth = paths.shape[1]
    for lvl in range(depth):
        sib = np.asarray(paths[:, lvl, :], np.uint64).T  # (8, Q)
        is_right = (idx & 1)[None, :] == 1
        left = np.where(is_right, sib, cur)
        right = np.where(is_right, cur, sib)
        state = np.concatenate([left, right], axis=0)  # (16, Q)
        cur = p2.permute_host(state)[: p2.DIGEST_ELEMS]
        idx >>= 1
    return bool((cur == np.asarray(root, np.uint64)[:, None]).all())


def verify_path(root: np.ndarray, index: int, leaf_values: np.ndarray, path: np.ndarray) -> bool:
    """Check a leaf (its raw column values) against the root.

    ``leaf_values``: (C,) canonical row values; ``path``: (depth, 8)."""
    cur = p2.hash_elements_host(np.asarray(leaf_values, np.uint64))
    idx = index
    for sib in path:
        if idx & 1:
            cur = p2.compress_host(sib, cur)
        else:
            cur = p2.compress_host(cur, sib)
        idx >>= 1
    return bool(np.array_equal(cur, np.asarray(root, np.uint64)))
