"""Goldilocks device kernels: Basefold commit path on the TPU.

Wires the 2-limb GL field kernels (fields/goldilocks.py: elements as
``(2,) + batch`` uint32 lo/hi limbs — the TPU has no 64-bit integer path)
into the GL PCS: the NTT encode and the Poseidon2-GL Merkle leaf sponge +
tree levels run as jitted device programs, mirroring pcs/ntt.py /
pcs/merkle.py for the BabyBear path. gl/pcs.py::commit routes matrices
above ``CENO_GL_HOST_N`` rows here (reference treats GL as a co-equal
field: ceno_zkvm/src/e2e.rs:103-129).

Byte-equality with the host mirrors (gl/pcs.encode, GlTree.build) is
asserted in tests/test_gl_device.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import goldilocks as gld
from ..fields import gl_host as gl
from ..utils import aotcache as aot
from . import poseidon2 as p2
from .pcs import _bitrev, _stage_twiddles


def pack_dev(x: np.ndarray):
    """Canonical uint64 array -> device (2,) + shape uint32 limbs."""
    x = np.asarray(x, np.uint64)
    return jnp.asarray(np.stack([
        (x & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (x >> np.uint64(32)).astype(np.uint32),
    ]))


def unpack(dev) -> np.ndarray:
    a = np.asarray(dev)
    return a[0].astype(np.uint64) | (a[1].astype(np.uint64) << np.uint64(32))


@functools.lru_cache(maxsize=None)
def _tw_packed(s: int) -> np.ndarray:
    tw = np.asarray(_stage_twiddles(s), np.uint64)
    return np.stack([
        (tw & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (tw >> np.uint64(32)).astype(np.uint32),
    ])


@aot.jit(static_argnames=("blowup_log",))
def encode_dev(evals, *, blowup_log: int):
    """(2, C, N) GL limbs -> (2, C, M) codeword (gl/pcs.encode mirror)."""
    _, c, n = evals.shape
    log_n = n.bit_length() - 1
    x = evals[:, :, jnp.asarray(_bitrev(log_n))]
    for j in range(log_n):  # mobius
        blk = 1 << j
        x = x.reshape(2, c, n // (2 * blk), 2, blk)
        x = x.at[:, :, :, 1, :].set(
            gld.sub(x[:, :, :, 1, :], x[:, :, :, 0, :])
        )
        x = x.reshape(2, c, n)
    m = n << blowup_log
    x = jnp.zeros((2, c, m), gld.DTYPE).at[:, :, :n].set(x)
    log_m = m.bit_length() - 1
    x = x[:, :, jnp.asarray(_bitrev(log_m))]
    for s in range(log_m):
        blk = 1 << (s + 1)
        half = 1 << s
        x = x.reshape(2, c, m // blk, blk)
        lo = x[:, :, :, :half]
        hi = x[:, :, :, half:]
        thi = gld.mul(hi, jnp.asarray(_tw_packed(s))[:, None, None, :])
        x = jnp.concatenate([gld.add(lo, thi), gld.sub(lo, thi)], axis=3)
        x = x.reshape(2, c, m)
    return x


# -- Poseidon2-GL width-8 device permutation ---------------------------------

def _d_sbox(x):
    x2 = gld.mul(x, x)
    x4 = gld.mul(x2, x2)
    return gld.mul(gld.mul(x4, x2), x)


def _d_m4(v):
    """v: (2, 4, N) -> M4 @ v."""
    rows = [v[:, j] for j in range(4)]
    s = gld.add(gld.add(rows[0], rows[1]), gld.add(rows[2], rows[3]))
    out = []
    for j in range(4):
        out.append(gld.add(
            s, gld.add(rows[j], gld.add(rows[(j + 1) % 4], rows[(j + 1) % 4]))
        ))
    return jnp.stack(out, axis=1)


def _d_external_linear(st):
    b0 = st[:, 0:4]
    b1 = st[:, 4:8]
    t = gld.add(b0, b1)
    return jnp.concatenate(
        [_d_m4(gld.add(b0, t)), _d_m4(gld.add(b1, t))], axis=1
    )


@functools.lru_cache(maxsize=1)
def _consts_packed():
    rc_ext = [np.stack([
        (row & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (row >> np.uint64(32)).astype(np.uint32),
    ]) for row in (np.asarray(r, np.uint64) for r in p2.RC_EXTERNAL)]
    rc_int = np.asarray(p2.RC_INTERNAL, np.uint64)
    diag = np.asarray(p2.INTERNAL_DIAG, np.uint64)
    diag_p = np.stack([
        (diag & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (diag >> np.uint64(32)).astype(np.uint32),
    ])
    return rc_ext, rc_int, diag_p


def permute_device(st):
    """Poseidon2-GL on (2, 8, N) limbs (gl/poseidon2.permute_host mirror).

    Rounds run under lax.scan (round constants are the scanned input), so
    each of the three phases traces ONE round body — the naive unroll
    traced ~270 round bodies per hash_and_tree program and took minutes
    of pure-python tracing (the BabyBear permute_device learned the same
    lesson)."""
    rc_ext, rc_int, diag = _consts_packed()
    half = p2.ROUNDS_F // 2
    diag_j = jnp.asarray(diag)[:, :, None]

    def ext_round(st, rc):  # rc (2, 8)
        return _d_external_linear(_d_sbox(gld.add(st, rc[:, :, None]))), None

    def int_round(st, rc):  # rc (2,)
        s0 = _d_sbox(gld.add(st[:, 0], rc[:, None]))
        st = st.at[:, 0].set(s0)
        ssum = st[:, 0]
        for i in range(1, p2.WIDTH):
            ssum = gld.add(ssum, st[:, i])
        return gld.add(gld.mul(st, diag_j), ssum[:, None]), None

    rc_ext_j = jnp.asarray(np.stack(rc_ext))            # (ROUNDS_F, 2, 8)
    rc_int_j = jnp.asarray(np.stack([
        (rc_int & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (rc_int >> np.uint64(32)).astype(np.uint32),
    ], axis=1))                                          # (ROUNDS_P, 2)
    st = _d_external_linear(st)
    st, _ = jax.lax.scan(ext_round, st, rc_ext_j[:half])
    st, _ = jax.lax.scan(int_round, st, rc_int_j)
    st, _ = jax.lax.scan(ext_round, st, rc_ext_j[half:])
    return st


@aot.jit
def hash_and_tree_dev(cw):
    """(2, C, M) codeword limbs -> (leaf digests (2, 4, M), levels tuple)."""
    _, c, m = cw.shape
    st = jnp.zeros((2, p2.WIDTH, m), gld.DTYPE)
    for off in range(0, max(c, 1), p2.RATE):
        chunk = cw[:, off: off + p2.RATE]
        k = chunk.shape[1]
        st = st.at[:, :k].set(gld.add(st[:, :k], chunk))
        st = permute_device(st)
    leaves = st[:, : p2.CAPACITY]
    levels = [leaves]
    cur = leaves
    while cur.shape[2] > 1:
        lo = cur[:, :, 0::2]
        hi = cur[:, :, 1::2]
        st = jnp.concatenate([lo, hi], axis=1)
        cur = permute_device(st)[:, : p2.CAPACITY]
        levels.append(cur)
    return tuple(levels)


def commit_device(cols: np.ndarray, blowup_log: int):
    """Host canonical (C, N) -> (codeword (C, M) canonical, GlTree).

    One device round trip: encode + leaf sponge + all tree levels as jitted
    2-limb programs; results come back canonical for the host open/verify
    path (GL sumcheck stays host in this config — the commit is the
    throughput-dominant stage)."""
    from .pcs import GlTree

    dev = pack_dev(np.asarray(cols, np.uint64))
    cw_dev = encode_dev(dev, blowup_log=blowup_log)
    level_devs = hash_and_tree_dev(cw_dev)
    cw = unpack(cw_dev)
    levels = [unpack(l) for l in level_devs]
    return cw, GlTree(levels)
