"""Generic monomial-term evaluation kernels for sumcheck rounds.

This is the framework's hot loop (mirrors the reference's multithreaded
``IOPProverState::prove`` over virtual polynomials, SURVEY.md §2.9 and hot
loops #1/#2 in §3.2): a virtual polynomial is a list of terms
``scalar_i * prod_k col_{idx[i,k]}`` over a bank of MLE columns. Each sumcheck
round evaluates the batched univariate g(t) at t = 0..deg over the half-cube
and then folds every column by the sampled challenge.

Design notes (TPU-first):
  * Columns live in two banks: base u32[Cb, N] and ext u32[4, Ce, N]
    (component axis leading). A constant-one column is appended to each bank;
    index ``Cb`` / ``Ce`` is the padding sentinel, so every term group becomes
    a dense (T, DB)/(T, DE) index matrix and ONE kernel shape serves all
    circuits with the same padded dimensions (keeps the XLA program count —
    and axon-tunnel compile time — low).
  * For large N the kernel scans terms sequentially (each step is N-wide VPU
    work); for small N it vmaps over terms. Threshold SMALL_N below.
  * Per-term univariate factors at t are built incrementally:
    col(t+1) = col(t) + diff, so t never multiplies anything.
  * The per-term scalar multiplies the already-summed (deg+1, 4) vector, not
    the N-wide product — ext*ext cost is O(1) per term.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import babybear as bb
from ..fields import ext4
from ..utils import aotcache as aot

SMALL_N = 2048


@aot.jit(static_argnames=("n",))
def make_banks(base_cols, ext_cols, n: int):
    """Stack column lists into padded banks (appends the ones sentinel col).

    Ext items are (4, N) single columns or (4, k, N) pre-stacked BLOCKS
    (k columns each) — blocks come from multi-output device kernels where
    per-column outputs would each pay a transfer round trip."""
    base = (
        jnp.stack(base_cols) if base_cols else jnp.zeros((0, n), bb.DTYPE)
    )
    base = jnp.concatenate([base, bb.ones((1, n))], axis=0)
    parts = [c[:, None, :] if c.ndim == 2 else c for c in ext_cols]
    ext = jnp.concatenate(parts + [ext4.ones((1, n))], axis=1)
    return base, ext


def _split(bank, axis):
    n = bank.shape[axis]
    half = n // 2
    lo = jax.lax.slice_in_dim(bank, 0, half, axis=axis)
    hi = jax.lax.slice_in_dim(bank, half, n, axis=axis)
    return lo, bb.sub(hi, lo)


def _term_contrib(blo, bdiff, elo, ediff, scalar, deg: int):
    """(deg+1, 4) contributions of one term; b* are (DB, half), e* (4, DE, half).

    The node axis is VECTORIZED: every field op is batched over the deg+1
    univariate nodes instead of being traced per node. Tracing cost is per
    traced op (~ms each through this jax version) and dominates fresh-process
    warmup, so ~(deg+1)x fewer ops means ~(deg+1)x faster tracing. The math
    (cumulative node adds, ascending product order) is unchanged —
    byte-identical round messages."""
    db = blo.shape[0]
    de = elo.shape[1]

    def nodes(lo, diff):
        outs = [lo]
        cur = lo
        for _ in range(deg):
            cur = bb.add(cur, diff)
            outs.append(cur)
        return jnp.stack(outs)  # (deg+1,) + lo.shape

    if db:
        bn = nodes(blo, bdiff)             # (deg+1, DB, half)
        pb = bn[:, 0]
        for k in range(1, db):
            pb = bb.mul(pb, bn[:, k])      # batched over nodes
    else:
        pb = None
    if de:
        en = jnp.moveaxis(nodes(elo, ediff), 0, 1)  # (4, deg+1, DE, half)
        pe = en[:, :, 0]
        for k in range(1, de):
            pe = ext4.mul(pe, en[:, :, k])          # (4, deg+1, half)
        if pb is not None:
            pe = ext4.mul_base(pe, pb)
        s = bb.sum_mod(pe, axis=-1)                 # (4, deg+1)
    else:
        s0 = bb.sum_mod(pb, axis=-1)                # (deg+1,)
        z = jnp.zeros_like(s0)
        s = jnp.stack([s0, z, z, z])
    out = ext4.mul(scalar[:, None], s)              # (4, deg+1)
    return jnp.moveaxis(out, 0, 1)                  # (deg+1, 4)


@aot.jit(static_argnames=("deg",))
def round_evals(base_bank, ext_bank, bidx, eidx, scalars, *, deg: int):
    """Batched univariate evals: (deg+1, 4) Monty.

    base_bank u32[Cb+1, N], ext_bank u32[4, Ce+1, N] (sentinel ones last),
    bidx (T, DB) int32, eidx (T, DE) int32, scalars (4, T) Monty.
    """
    blo, bdiff = _split(base_bank, axis=1)
    elo, ediff = _split(ext_bank, axis=2)
    n_half = blo.shape[1]

    def body(term):
        bi, ei, sc = term
        return _term_contrib(
            blo[bi], bdiff[bi], elo[:, ei], ediff[:, ei], sc, deg
        )

    terms = (bidx, eidx, jnp.moveaxis(scalars, 0, 1))  # (T, DB), (T, DE), (T, 4)
    if n_half <= SMALL_N:
        contribs = jax.vmap(body)(terms)  # (T, deg+1, 4)
        return bb.sum_mod(jnp.moveaxis(contribs, 0, -1), axis=-1)
    else:
        def scan_body(carry, term):
            return bb.add(carry, body(term)), None

        init = jnp.zeros((deg + 1, 4), bb.DTYPE)
        acc, _ = jax.lax.scan(scan_body, init, terms)
        return acc


@aot.jit
def fold_banks(base_bank, ext_bank, r):
    """Fold every column by ext challenge r: returns merged ext bank
    (4, Cb+Ce+1, N/2) ordered [base cols..., ext cols..., ones]."""
    blo, bdiff = _split(base_bank, axis=1)
    elo, ediff = _split(ext_bank, axis=2)
    # base -> ext: comp0 = lo + r0*diff, comp_i = r_i*diff
    folded_base = jnp.stack(
        [
            bb.add(blo, bb.mul(r[0], bdiff)),
            bb.mul(r[1], bdiff),
            bb.mul(r[2], bdiff),
            bb.mul(r[3], bdiff),
        ]
    )  # (4, Cb+1, half)
    folded_ext = ext4.add(elo, ext4.mul(r[:, None, None], ediff))
    # drop base sentinel (folds to ones with diff 0 -> comp0=1, others 0 — keep
    # ext sentinel as the single ones column at the end)
    return jnp.concatenate([folded_base[:, :-1], folded_ext], axis=1)


@aot.jit
def fold_ext_bank(ext_bank, r):
    """Fold an all-ext bank (4, C, N) -> (4, C, N/2)."""
    elo, ediff = _split(ext_bank, axis=2)
    return ext4.add(elo, ext4.mul(r[:, None, None], ediff))


def merge_indices(bidx: np.ndarray, eidx: np.ndarray, n_base: int, n_ext: int):
    """Index remap after the first fold: base j -> j, ext k -> n_base + k;
    sentinels (n_base, n_ext) both -> n_base + n_ext."""
    b = np.where(bidx == n_base, n_base + n_ext, bidx)
    e = eidx + n_base
    return np.concatenate([b, e], axis=1).astype(np.int32)


@aot.jit(static_argnames=("deg",))
def round_evals_ext(ext_bank, idx, scalars, *, deg: int):
    """Round evals when every column is ext (rounds >= 1)."""
    empty_base = jnp.zeros((1, ext_bank.shape[2]), bb.DTYPE)
    empty_bidx = jnp.zeros((idx.shape[0], 0), jnp.int32)
    return round_evals(empty_base, ext_bank, empty_bidx, idx, scalars, deg=deg)


@aot.jit
def final_evals(ext_bank):
    """After all rounds each column has length 1: return (4, C) opening evals."""
    return ext_bank[..., 0]


# Fused per-round kernels: fold by the previous challenge, then evaluate the
# next round's univariate — ONE device call per round instead of two (the
# axon tunnel's per-call latency dominates small rounds).

@aot.jit(static_argnames=("deg",))
def fold_mixed_then_round(base_bank, ext_bank, r, midx, scalars, *, deg: int):
    merged = fold_banks(base_bank, ext_bank, r)
    empty_base = jnp.zeros((1, merged.shape[2]), bb.DTYPE)
    empty_bidx = jnp.zeros((midx.shape[0], 0), jnp.int32)
    ev = round_evals(empty_base, merged, empty_bidx, midx, scalars, deg=deg)
    return ev, merged


@aot.jit(static_argnames=("deg",))
def fold_ext_then_round(ext_bank, r, midx, scalars, *, deg: int):
    merged = fold_ext_bank(ext_bank, r)
    empty_base = jnp.zeros((1, merged.shape[2]), bb.DTYPE)
    empty_bidx = jnp.zeros((midx.shape[0], 0), jnp.int32)
    ev = round_evals(empty_base, merged, empty_bidx, midx, scalars, deg=deg)
    return ev, merged
