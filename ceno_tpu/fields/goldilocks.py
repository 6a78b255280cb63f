"""Goldilocks field p = 2^64 - 2^32 + 1 as vectorized TPU kernels.

TPU has no 64-bit integer path, so elements are stored as two uint32 limbs in a
leading axis: shape ``(2,) + batch_shape`` with ``[0] = lo``, ``[1] = hi``,
canonical form (< p). Reduction exploits 2^64 = 2^32 - 1 and 2^96 = -1 (mod p),
so a 128-bit product folds in two steps with no Montgomery machinery.

Mirror of the reference's optional Goldilocks path (``ff_ext::GoldilocksExt2``,
SURVEY.md §2.9). BabyBear is the default field for the TPU build; this module
provides functional parity for the base field (ext2 lives in goldilocks_ext2).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

P = (1 << 64) - (1 << 32) + 1
EPS = (1 << 32) - 1  # 2^64 mod p
DTYPE = jnp.uint32
GENERATOR = 7
TWO_ADICITY = 32


def _u32(x):
    return jnp.uint32(x)


def pack(lo, hi):
    return jnp.stack([lo, hi])


def zeros(shape):
    return jnp.zeros((2,) + tuple(shape), DTYPE)


def full(shape, v: int):
    v %= P
    return jnp.stack(
        [jnp.full(shape, v & 0xFFFFFFFF, DTYPE), jnp.full(shape, v >> 32, DTYPE)]
    )


def ones(shape):
    return full(shape, 1)


# -- u64 helpers on (lo, hi) uint32 pairs -----------------------------------

def _add64(alo, ahi, blo, bhi):
    """(a + b) mod 2^64 with carry-out."""
    lo = alo + blo
    c0 = (lo < alo).astype(DTYPE)
    hi1 = ahi + bhi
    c1 = (hi1 < ahi).astype(DTYPE)
    hi = hi1 + c0
    c2 = (hi < hi1).astype(DTYPE)
    return lo, hi, c1 + c2


def _sub64(alo, ahi, blo, bhi):
    """(a - b) mod 2^64 with borrow-out."""
    lo = alo - blo
    b0 = (alo < blo).astype(DTYPE)
    hi1 = ahi - bhi
    b1 = (ahi < bhi).astype(DTYPE)
    hi = hi1 - b0
    b2 = (hi1 < b0).astype(DTYPE)
    return lo, hi, b1 + b2


def _geq64(alo, ahi, blo, bhi):
    return (ahi > bhi) | ((ahi == bhi) & (alo >= blo))


def _mul32(a, b):
    """32x32 -> 64 product as (lo, hi) uint32 (16-bit partials)."""
    a0 = a & 0xFFFF
    a1 = a >> 16
    b0 = b & 0xFFFF
    b1 = b >> 16
    t00 = a0 * b0
    t01 = a0 * b1
    t10 = a1 * b0
    t11 = a1 * b1
    mid = t01 + t10
    mid_c = (mid < t01).astype(DTYPE)
    lo = t00 + (mid << 16)
    lo_c = (lo < t00).astype(DTYPE)
    hi = t11 + (mid >> 16) + (mid_c << 16) + lo_c
    return lo, hi


_P_LO = _u32(P & 0xFFFFFFFF)  # = 1
_P_HI = _u32(P >> 32)         # = 0xFFFFFFFF


def _cond_sub_p(lo, hi):
    ge = _geq64(lo, hi, jnp.full_like(lo, _P_LO), jnp.full_like(hi, _P_HI))
    slo, shi, _ = _sub64(lo, hi, jnp.full_like(lo, _P_LO), jnp.full_like(hi, _P_HI))
    return jnp.where(ge, slo, lo), jnp.where(ge, shi, hi)


def add(a, b):
    lo, hi, carry = _add64(a[0], a[1], b[0], b[1])
    # carry => value - 2^64; fold with += eps (cannot carry again: a+b-2^64 < p)
    lo2, hi2, _ = _add64(lo, hi, carry * _u32(EPS), jnp.zeros_like(hi))
    lo3, hi3 = _cond_sub_p(lo2, hi2)
    lo3, hi3 = jax.lax.optimization_barrier((lo3, hi3))  # see mul fence note
    return pack(lo3, hi3)


def sub(a, b):
    lo, hi, borrow = _sub64(a[0], a[1], b[0], b[1])
    # borrow => value + 2^64; fold with -= eps (cannot borrow again)
    lo2, hi2, _ = _sub64(lo, hi, borrow * _u32(EPS), jnp.zeros_like(hi))
    lo2, hi2 = jax.lax.optimization_barrier((lo2, hi2))  # see mul fence note
    return pack(lo2, hi2)


def neg(a):
    return sub(zeros(a.shape[1:]), a)


def mul(a, b):
    """Full 64x64 product then reduce128: x = n0 + n1*2^64; with n1 = (h0, h1),
    x = n0 + h0*(2^32 - 1) - h1 (mod p)."""
    a0, a1 = a[0], a[1]
    b0, b1 = b[0], b[1]
    p00l, p00h = _mul32(a0, b0)
    p01l, p01h = _mul32(a0, b1)
    p10l, p10h = _mul32(a1, b0)
    p11l, p11h = _mul32(a1, b1)
    # accumulate 128-bit: n0=p00l, n1=p00h+p01l+p10l, n2=p01h+p10h+p11l+c, n3=p11h+c
    n0 = p00l
    n1a = p00h + p01l
    c1a = (n1a < p00h).astype(DTYPE)
    n1 = n1a + p10l
    c1b = (n1 < n1a).astype(DTYPE)
    c1 = c1a + c1b
    n2a = p01h + p10h
    c2a = (n2a < p01h).astype(DTYPE)
    n2b = n2a + p11l
    c2b = (n2b < n2a).astype(DTYPE)
    n2 = n2b + c1
    c2c = (n2 < n2b).astype(DTYPE)
    n3 = p11h + c2a + c2b + c2c
    # reduce: x_lo = (n0, n1); h0 = n2, h1 = n3
    # t0 = x_lo - h1  (borrow -> -= eps)
    t0l, t0h, bw = _sub64(n0, n1, n3, jnp.zeros_like(n3))
    t0l, t0h, _ = _sub64(t0l, t0h, bw * _u32(EPS), jnp.zeros_like(t0h))
    # s = h0 * eps  (fits in 64 bits)
    sl, sh = _mul32(n2, jnp.full_like(n2, _u32(EPS)))
    rl, rh, cy = _add64(t0l, t0h, sl, sh)
    rl, rh, _ = _add64(rl, rh, cy * _u32(EPS), jnp.zeros_like(rh))
    rl, rh = _cond_sub_p(rl, rh)
    # fusion fence: XLA's CPU pipeline goes EXPONENTIAL fusing chained
    # 2-limb products (a depth-2 mul-of-mul chain ran the compiler to 90 GB
    # RSS before being killed; with the fence a 32-deep chain compiles in
    # 2s). The barrier caps fusion at one REDC — negligible runtime cost
    # next to the 16 partial products it already materializes.
    rl, rh = jax.lax.optimization_barrier((rl, rh))
    return pack(rl, rh)


def pow_const(a, e: int):
    result = None
    acc = a
    while e > 0:
        if e & 1:
            result = acc if result is None else mul(result, acc)
        e >>= 1
        if e:
            acc = mul(acc, acc)
    if result is None:
        return ones(jnp.shape(a)[1:])
    return result


def inv(a):
    return pow_const(a, P - 2)


# -- host-side helpers ------------------------------------------------------

def np_pack(x) -> np.ndarray:
    """Python-int / object array of canonical values -> (2, ...) uint32."""
    v = np.asarray(x, dtype=np.uint64)
    return np.stack([(v & 0xFFFFFFFF).astype(np.uint32), (v >> 32).astype(np.uint32)])


def np_unpack(x: np.ndarray) -> np.ndarray:
    return x[0].astype(np.uint64) | (x[1].astype(np.uint64) << 32)
