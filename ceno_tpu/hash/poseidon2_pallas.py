"""Pallas TPU kernel: fused Poseidon2 leaf sponge over a codeword matrix.

The Merkle leaf hash is the prover's single hottest hash loop (commit span,
SURVEY.md §2.9 mpcs role): for a (C, M) codeword it runs ceil(C/8) sponge
permutations per leaf over M = 2^22 lanes at the 2^20 bench shape. The
stock XLA path (hash/poseidon2.py::permute_device) keeps rounds under
``lax.scan``, so every round round-trips the full (16, M) state through HBM
— ~21 x ceil(C/8) full-array passes, ~10x off the memory-bandwidth bound.

This kernel fuses the ENTIRE sponge (all absorbs, all rounds, all
permutations) into one VMEM-resident pass per lane tile: HBM traffic drops
to one read of the codeword block plus one (8, M) digest write. The round
structure is fully unrolled inside the kernel (static C), and the field
arithmetic is the same Monty-form uint32 ops the rest of the framework
uses (fields/babybear.py — pure jnp, so they lower through Mosaic as-is).

Byte-equality with the host/XLA backends is asserted in
tests/test_poseidon2.py (interpret mode on CPU; real kernel on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import babybear as bb
from . import poseidon2 as p2

TILE = 512  # lanes per grid step (multiple of the 128-lane VPU width)


def _ext_linear(st):
    """External MDS circ(2*M4, M4, M4, M4) on a (16, T) Monty state,
    2-D-native (row slices stay (k, T) — Mosaic-friendly layouts)."""
    tsum = bb.add(bb.add(st[0:4], st[4:8]), bb.add(st[8:12], st[12:16]))
    outs = []
    for i in range(4):
        x = bb.add(st[4 * i: 4 * i + 4], tsum)
        s = bb.add(bb.add(x[0:1], x[1:2]), bb.add(x[2:3], x[3:4]))
        outs.append(bb.add(s, bb.add(x[0:1], bb.double(x[1:2]))))
        outs.append(bb.add(s, bb.add(x[1:2], bb.double(x[2:3]))))
        outs.append(bb.add(s, bb.add(x[2:3], bb.double(x[3:4]))))
        outs.append(bb.add(s, bb.add(x[3:4], bb.double(x[0:1]))))
    return jnp.concatenate(outs, axis=0)


def _sbox(x):
    x2 = bb.mul(x, x)
    x4 = bb.mul(x2, x2)
    return bb.mul(bb.mul(x4, x2), x)


def _int_linear(st, diag):
    s = st[0:1]
    for i in range(1, p2.WIDTH):
        s = bb.add(s, st[i: i + 1])
    return bb.add(bb.mul(st, diag), s)


def _permute_unrolled(st, rc_ext, rc_int, diag):
    """Full Poseidon2 permutation on (16, T), straight-line (no scan).

    ``rc_ext`` (ROUNDS_F, 16), ``rc_int`` (ROUNDS_P, 1), ``diag`` (16, 1)
    are kernel INPUTS (Mosaic rejects captured array constants)."""
    half = p2.ROUNDS_F // 2
    st = _ext_linear(st)
    for r in range(half):
        st = _ext_linear(_sbox(bb.add(st, rc_ext[r].reshape(p2.WIDTH, 1))))
    for r in range(p2.ROUNDS_P):
        s0 = _sbox(bb.add(st[0:1], rc_int[r].reshape(1, 1)))
        st = jnp.concatenate([s0, st[1:]], axis=0)
        st = _int_linear(st, diag)
    for r in range(half, p2.ROUNDS_F):
        st = _ext_linear(_sbox(bb.add(st, rc_ext[r].reshape(p2.WIDTH, 1))))
    return st


def _consts():
    rc_ext = jnp.asarray(np.asarray(p2._RC_EXTERNAL_M))
    rc_int = jnp.asarray(np.asarray(p2._RC_INTERNAL_M).reshape(-1, 1))
    diag = jnp.asarray(np.asarray(p2._DIAG_M).reshape(p2.WIDTH, 1))
    return rc_ext, rc_int, diag


def _const_specs():
    fixed = lambda i: (0, 0)  # noqa: E731 — replicated across the grid
    return [
        pl.BlockSpec((p2.ROUNDS_F, p2.WIDTH), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((p2.ROUNDS_P, 1), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((p2.WIDTH, 1), fixed, memory_space=pltpu.VMEM),
    ]


def _leaf_kernel(rc_ext_ref, rc_int_ref, diag_ref, cols_ref, out_ref, *,
                 n_cols: int):
    t = cols_ref.shape[1]
    rc_ext, rc_int, diag = rc_ext_ref[:], rc_int_ref[:], diag_ref[:]
    st = jnp.zeros((p2.WIDTH, t), jnp.uint32)
    for off in range(0, max(n_cols, 1), p2.RATE):
        k = min(p2.RATE, max(n_cols, 1) - off) if n_cols else 0
        if k:
            chunk = cols_ref[off: off + k, :]
            st = jnp.concatenate(
                [bb.add(st[:k], chunk), st[k:]], axis=0
            )
        st = _permute_unrolled(st, rc_ext, rc_int, diag)
    out_ref[:] = st[: p2.DIGEST_ELEMS]


@functools.partial(jax.jit, static_argnames=("interpret",))
def leaf_sponge(cols, interpret: bool = False):
    """(C, M) Monty uint32 codeword -> (8, M) Monty leaf digests.

    Requires M % TILE == 0 (device codewords are powers of two well above
    TILE; smaller matrices take the host path via HOST_COMMIT_N)."""
    c, m = cols.shape
    assert m % TILE == 0, m
    kern = functools.partial(_leaf_kernel, n_cols=c)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((p2.DIGEST_ELEMS, m), jnp.uint32),
        grid=(m // TILE,),
        in_specs=_const_specs() + [
            pl.BlockSpec((max(c, 1), TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((p2.DIGEST_ELEMS, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*_consts(), cols)


def _compress_kernel(rc_ext_ref, rc_int_ref, diag_ref, lo_ref, hi_ref,
                     out_ref):
    st = jnp.concatenate([lo_ref[:], hi_ref[:]], axis=0)  # (16, T)
    out_ref[:] = _permute_unrolled(
        st, rc_ext_ref[:], rc_int_ref[:], diag_ref[:]
    )[: p2.DIGEST_ELEMS]


@functools.partial(jax.jit, static_argnames=("interpret",))
def compress_level(level, interpret: bool = False):
    """One Merkle level: (8, m) digests -> (8, m/2) parent digests.

    Pair de-interleave (children 2i, 2i+1) happens OUTSIDE the kernel (XLA
    reshuffle); the kernel fuses the 21-round compression permutation."""
    half = level.shape[1] // 2
    pairs = level.reshape(p2.DIGEST_ELEMS, half, 2)
    lo = pairs[:, :, 0]
    hi = pairs[:, :, 1]
    if half % TILE:
        # small top levels: the scan path is fine (tiny arrays)
        st = jnp.concatenate([lo, hi], axis=0)
        return p2.permute_device(st)[: p2.DIGEST_ELEMS]
    return pl.pallas_call(
        _compress_kernel,
        out_shape=jax.ShapeDtypeStruct((p2.DIGEST_ELEMS, half), jnp.uint32),
        grid=(half // TILE,),
        in_specs=_const_specs() + [
            pl.BlockSpec((p2.DIGEST_ELEMS, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p2.DIGEST_ELEMS, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((p2.DIGEST_ELEMS, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*_consts(), lo, hi)
