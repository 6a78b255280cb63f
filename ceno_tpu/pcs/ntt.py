"""Batched radix-2 NTT and multilinear coefficient transforms (device).

Role mirror of the reference PCS's RS-encoding layer (mpcs Basefold,
SURVEY.md §2.9). Everything is batched over a column axis: the trace matrix
(C columns x N rows) is encoded column-wise in ONE jitted program —
möbius transform (evals -> multilinear/univariate coefficients), zero-pad by
the blowup, bit-reversal gather, then the full log2(M)-stage butterfly chain.

Domain/variable-order contract (load-bearing, see pcs/basefold.py): the
committed codeword belongs to the variable-REVERSED multilinear, so the
Basefold even/odd codeword fold binds the same variable as a top-variable
sumcheck round. Codewords are in natural domain order; folding pairs (i,
i + M/2), i.e. contiguous halves — the TPU-friendly direction.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import babybear as bb
from ..utils import aotcache as aot


@functools.lru_cache(maxsize=None)
def bitrev_perm(n_bits: int) -> np.ndarray:
    n = 1 << n_bits
    idx = np.arange(n)
    rev = np.zeros(n, np.int32)
    for b in range(n_bits):
        rev |= ((idx >> b) & 1) << (n_bits - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def _twiddles_monty(log_m: int) -> tuple:
    """Per-stage twiddle arrays (Monty, numpy): stage s uses w_{2^{s+1}}^k."""
    out = []
    for s in range(log_m):
        m = 1 << (s + 1)
        w = bb.two_adic_root(s + 1)
        tw = np.empty(1 << s, np.uint32)
        cur = 1
        for k in range(1 << s):
            tw[k] = bb.const(cur)
            cur = cur * w % bb.P
        out.append(tw)
    return tuple(out)


@functools.lru_cache(maxsize=None)
def domain_pow_inv(log_m: int) -> np.ndarray:
    """Canonical w_M^{-i} for i in [0, M/2) (host, for fold twiddles).

    Built by vectorized doubling (log m numpy passes); the scalar-python
    version ran 2^21 big-int multiplies on first use at bench sizes."""
    m = 1 << log_m
    w_inv = pow(bb.two_adic_root(log_m), bb.P - 2, bb.P)
    out = np.ones(1, np.uint64)
    step = np.uint64(w_inv)
    p = np.uint64(bb.P)
    while len(out) < m // 2:
        out = np.concatenate([out, out * step % p])
        step = step * step % p
    return out[: m // 2]


def mobius(x):
    """Evals -> multilinear coefficients, batched (C, N). In-place butterflies:
    for each variable, coeff_hi -= coeff_lo over contiguous halves."""
    c, n = x.shape
    log_n = n.bit_length() - 1
    for j in range(log_n):
        blk = 1 << j
        x = x.reshape(c, n // (2 * blk), 2, blk)
        x = x.at[:, :, 1, :].set(bb.sub(x[:, :, 1, :], x[:, :, 0, :]))
        x = x.reshape(c, n)
    return x


def zeta(x):
    """Multilinear coefficients -> evals (inverse of mobius)."""
    c, n = x.shape
    log_n = n.bit_length() - 1
    for j in range(log_n):
        blk = 1 << j
        x = x.reshape(c, n // (2 * blk), 2, blk)
        x = x.at[:, :, 1, :].set(bb.add(x[:, :, 1, :], x[:, :, 0, :]))
        x = x.reshape(c, n)
    return x


def ntt_natural(x):
    """DIT NTT: input coeffs in NATURAL order (bit-reversed internally),
    output evals in natural domain order. Batched (C, M)."""
    c, m = x.shape
    log_m = m.bit_length() - 1
    x = x[:, jnp.asarray(bitrev_perm(log_m))]
    tws = _twiddles_monty(log_m)
    for s in range(log_m):
        blk = 1 << (s + 1)
        half = 1 << s
        x = x.reshape(c, m // blk, blk)
        lo = x[:, :, :half]
        hi = x[:, :, half:]
        thi = bb.mul(hi, jnp.asarray(tws[s])[None, None, :])
        x = jnp.concatenate([bb.add(lo, thi), bb.sub(lo, thi)], axis=2)
        x = x.reshape(c, m)
    return x


def np_encode(evals: np.ndarray, *, blowup_log: int) -> np.ndarray:
    """Host numpy mirror of :func:`encode` on canonical uint64 (C, N) arrays.

    Used for small matrices where XLA program size/compile time dominates."""
    p = np.uint64(bb.P)
    c, n = evals.shape
    log_n = n.bit_length() - 1
    x = evals[:, bitrev_perm(log_n)].astype(np.uint64)
    for j in range(log_n):  # mobius
        blk = 1 << j
        x = x.reshape(c, n // (2 * blk), 2, blk)
        x[:, :, 1, :] = (x[:, :, 1, :] + p - x[:, :, 0, :]) % p
        x = x.reshape(c, n)
    m = n << blowup_log
    padded = np.zeros((c, m), np.uint64)
    padded[:, :n] = x
    log_m = m.bit_length() - 1
    x = padded[:, bitrev_perm(log_m)]
    for s in range(log_m):
        blk = 1 << (s + 1)
        half = 1 << s
        x = x.reshape(c, m // blk, blk)
        lo = x[:, :, :half]
        hi = x[:, :, half:]
        w = bb.two_adic_root(s + 1)
        tw = np.empty(half, np.uint64)
        cur = 1
        for k in range(half):
            tw[k] = cur
            cur = cur * w % bb.P
        thi = hi * tw[None, None, :] % p
        x = np.concatenate([(lo + thi) % p, (lo + p - thi) % p], axis=2)
        x = x.reshape(c, m)
    return x


@aot.jit(static_argnames=("blowup_log", "reverse_vars"))
def encode(evals, *, blowup_log: int, reverse_vars: bool = True):
    """Full Basefold encoding: (C, N) Monty evals -> (C, N << blowup_log)
    codewords. ``reverse_vars`` commits the variable-reversed multilinear
    (see module docstring)."""
    c, n = evals.shape
    log_n = n.bit_length() - 1
    if reverse_vars:
        evals = evals[:, jnp.asarray(bitrev_perm(log_n))]
    coeffs = mobius(evals)
    m = n << blowup_log
    padded = jnp.zeros((c, m), bb.DTYPE).at[:, :n].set(coeffs)
    return ntt_natural(padded)
