"""Content-addressed cache for Basefold commitments of KEY material.

keygen's only device work is the Basefold commit of the stacked fixed
columns — deterministic data that never changes unless the tables change.
On a cold driver run that commit costs minutes of tunnel compiles; cached,
it costs one ~30 MB file read + device_put transfers.

The cache key is a digest of the MATRIX CONTENT + the commitment-relevant
params (blowup), so it is immune to unrelated source edits and can never
serve a stale commitment: different fixed tables -> different key.

The cached tree is restored as a HOST tree (canonical digest levels), which
open_paths serves without any device gather program — one fewer XLA program
on the critical bench path. cols/codeword are restored to device Monty form
so the opening kernels run exactly as with a fresh commit.

Role note: the reference persists whole proving keys to disk the same way
(keygen is a one-time setup cost, e2e.rs checkpointing); this is the
TPU-shaped slice of that — only the device-expensive artifact is cached.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

from ..fields import babybear as bb
from . import basefold
from .merkle import MerkleTree


def _key(mat: np.ndarray, params) -> str:
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(mat, np.uint64).tobytes())
    h.update(repr((mat.shape, int(params.blowup_log))).encode())
    return h.hexdigest()[:32]


def commit_cached(mat: np.ndarray, params, cache_dir: str | None = None):
    """basefold.commit(mat) with an on-disk cache (see module doc).

    ``mat`` is a host canonical (C, N) matrix. With ``cache_dir`` None (or
    for host-side commits, which are already cheap) this is a plain commit.
    """
    cache_dir = cache_dir or os.environ.get("CENO_TPU_COMMIT_CACHE")
    n = mat.shape[1]
    if not cache_dir or n <= basefold.HOST_COMMIT_N or \
            params.pcs_kind == "whir":
        return basefold.commit(mat, params)
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"commit-{_key(mat, params)}.npz")
    if os.path.exists(path):
        try:
            return _load(path, mat, params)
        except Exception:
            try:
                os.unlink(path)
            except OSError:
                pass
    committed = basefold.commit(mat, params)
    try:
        _save(path, committed)
    except Exception:
        pass
    return committed


def _save(path: str, committed) -> None:
    tree = committed.tree
    if tree.leaf_digests is not None:
        leaves = np.asarray(tree.leaf_digests, np.uint64)
        levels = [np.asarray(l, np.uint64) for l in tree.levels]
    else:
        leaves = bb.np_from_monty(np.asarray(tree.dev_leaves)).astype(np.uint64)
        levels = [
            bb.np_from_monty(np.asarray(l)).astype(np.uint64)
            for l in tree.dev_levels
        ]
    cw = np.asarray(committed.codeword)
    if cw.dtype != np.uint64:  # device Monty -> canonical
        cw = bb.np_from_monty(cw).astype(np.uint64)
    payload = {
        "cw": cw.astype(np.uint32),
        "leaves": leaves.astype(np.uint32),
        "n_vars": np.int64(committed.n_vars),
        "n_levels": np.int64(len(levels)),
    }
    for i, l in enumerate(levels):
        payload[f"level{i}"] = l.astype(np.uint32)
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **payload)
    os.replace(tmp, path)


def _load(path: str, mat: np.ndarray, params):
    import jax.numpy as jnp

    with np.load(path) as z:
        cw = z["cw"].astype(np.uint64)
        leaves = z["leaves"].astype(np.uint64)
        n_vars = int(z["n_vars"])
        levels = [
            z[f"level{i}"].astype(np.uint64) for i in range(int(z["n_levels"]))
        ]
    root = (levels[-1][:, 0] if levels else leaves[:, 0]).astype(np.uint64)
    tree = MerkleTree(leaves, levels, root)
    cols_dev = jnp.asarray(bb.np_to_monty(mat.astype(np.uint32)))
    cw_dev = jnp.asarray(bb.np_to_monty(cw.astype(np.uint32)))
    return basefold.Committed(cols_dev, cw_dev, tree, n_vars)
