"""BabyBear base field as vectorized TPU kernels.

p = 2^31 - 2^27 + 1 = 0x78000001 (two-adicity 27).

All device arrays hold elements in **Montgomery form** (value * 2^32 mod p) stored
as ``uint32``. Montgomery form is the single on-device representation used by the
whole framework; canonical u32 values only appear at host boundaries
(:func:`to_monty` / :func:`from_monty`).

Multiplication is a 32-bit Montgomery REDC built from native wrapping uint32
multiplies: a 32x32->64 product is assembled from four 16x16->32 partial products
(the TPU VPU has no 64-bit integer path), then REDC folds the low word with
``m = lo * PINV`` and one more 32x64 product with the constant modulus. XLA
constant-folds the limb split of ``P`` so the REDC high-product costs two real
multiplies.

Role mirror of the reference's external ``ff_ext``/``p3`` BabyBear crates
(see SURVEY.md §2.9); the arithmetic here is an independent TPU-first
implementation, not a translation.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Constants (python ints; wrapped lazily into jnp scalars inside traced code)
# ---------------------------------------------------------------------------
P = 2013265921  # 0x78000001
TWO_ADICITY = 27
GENERATOR = 31  # multiplicative generator of F_p^*
MONTY_BITS = 32
R = (1 << 32) % P          # Montgomery R mod p = 2^28 - 2
R2 = pow(1 << 32, 2, P)    # R^2 mod p, used by to_monty
PINV = (-pow(P, -1, 1 << 32)) % (1 << 32)  # -p^{-1} mod 2^32

DTYPE = jnp.uint32

_U16 = 0xFFFF


def const(v: int) -> int:
    """Montgomery representation of the canonical integer ``v`` (python int)."""
    return (v % P) * (1 << 32) % P


MONTY_ONE = const(1)
MONTY_NEG_ONE = const(P - 1)


def _u32(x: int):
    return jnp.uint32(x)


# ---------------------------------------------------------------------------
# 32x32 -> 64 bit product from 16-bit partials (returns (hi, lo) uint32)
# ---------------------------------------------------------------------------

def mul64(a, b):
    """Full 64-bit product of uint32 arrays ``a * b`` as ``(hi, lo)`` uint32."""
    a0 = a & _U16
    a1 = a >> 16
    b0 = b & _U16
    b1 = b >> 16
    t00 = a0 * b0
    t01 = a0 * b1
    t10 = a1 * b0
    t11 = a1 * b1
    mid = t01 + t10  # may wrap once
    mid_carry = (mid < t01).astype(DTYPE)
    lo = t00 + (mid << 16)
    lo_carry = (lo < t00).astype(DTYPE)
    hi = t11 + (mid >> 16) + (mid_carry << 16) + lo_carry
    return hi, lo


# ---------------------------------------------------------------------------
# Field ops (Montgomery domain). Inputs/outputs are canonical-reduced (< p).
# ---------------------------------------------------------------------------

def add(a, b):
    s = a + b  # a, b < p < 2^31: no wrap
    return jnp.where(s >= _u32(P), s - _u32(P), s)


def sub(a, b):
    d = a - b  # wrapping
    return jnp.where(a >= b, d, d + _u32(P))


def neg(a):
    return jnp.where(a == 0, a, _u32(P) - a)


def double(a):
    return add(a, a)


def mul(a, b):
    """Montgomery product: returns a*b/R mod p (both operands in Monty form)."""
    hi, lo = mul64(a, b)
    m = lo * _u32(PINV)          # mod 2^32
    mp_hi, _ = mul64(m, _u32(P))
    t = hi + mp_hi + (lo != 0).astype(DTYPE)
    return jnp.where(t >= _u32(P), t - _u32(P), t)


def mul_const(a, c_monty: int):
    """Multiply by a compile-time Montgomery constant."""
    return mul(a, jnp.full((), c_monty, DTYPE))


def from_monty(a):
    """Montgomery -> canonical value."""
    m = a * _u32(PINV)
    mp_hi, _ = mul64(m, _u32(P))
    t = mp_hi + (a != 0).astype(DTYPE)
    return jnp.where(t >= _u32(P), t - _u32(P), t)


def to_monty(a):
    """Canonical value (< p) -> Montgomery form."""
    return mul(a, jnp.full((), R2, DTYPE))


def pow_const(a, e: int):
    """a ** e for python-int exponent, via square and multiply (unrolled)."""
    result = None
    acc = a
    while e > 0:
        if e & 1:
            result = acc if result is None else mul(result, acc)
        e >>= 1
        if e:
            acc = mul(acc, acc)
    if result is None:
        return jnp.full(jnp.shape(a), MONTY_ONE, DTYPE)
    return result


def inv(a):
    """Field inverse via Fermat: a^(p-2). a must be nonzero."""
    return pow_const(a, P - 2)


def sum_mod(x, axis: int = -1):
    """Modular sum along ``axis`` via halving tree (power-of-2 padded).

    jnp.sum would overflow uint32; a halving tree of :func:`add` keeps every
    intermediate < p with log2(n) vectorized adds.
    """
    axis = axis % x.ndim
    n = x.shape[axis]
    pow2 = 1 << (n - 1).bit_length()
    if pow2 != n:
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, pow2 - n)
        x = jnp.pad(x, pad)
        n = pow2
    while n > 1:
        half = n // 2
        lo = jax.lax.slice_in_dim(x, 0, half, axis=axis)
        hi = jax.lax.slice_in_dim(x, half, n, axis=axis)
        x = add(lo, hi)
        n = half
    return jnp.squeeze(x, axis=axis)


def zeros(shape):
    return jnp.zeros(shape, DTYPE)


def ones(shape):
    return jnp.full(shape, MONTY_ONE, DTYPE)


def full(shape, v: int):
    """Array filled with canonical value v (stored in Monty form)."""
    return jnp.full(shape, const(v), DTYPE)


# ---------------------------------------------------------------------------
# Host-side helpers (numpy / python ints)
# ---------------------------------------------------------------------------

def np_to_monty(x: np.ndarray) -> np.ndarray:
    """Canonical uint32/int numpy array -> Monty-form uint32 numpy array."""
    v = np.asarray(x, dtype=np.uint64) % P
    return ((v << 32) % P).astype(np.uint32)


def np_from_monty(x: np.ndarray) -> np.ndarray:
    v = (np.asarray(x, dtype=np.uint64) * pow(R, P - 2, P)) % P
    return v.astype(np.uint32)


def two_adic_root(bits: int) -> int:
    """Canonical 2^bits-th root of unity (python int)."""
    assert bits <= TWO_ADICITY
    root = pow(GENERATOR, (P - 1) >> TWO_ADICITY, P)
    for _ in range(TWO_ADICITY - bits):
        root = root * root % P
    return root
