"""BabyBear quartic extension F_p[x]/(x^4 - 11) as vectorized TPU kernels.

Extension elements are stored struct-of-arrays: shape ``(4,) + batch_shape`` of
Monty-form uint32, so every component slice is a contiguous lane-friendly vector
(the trailing axis maps onto the VPU's 128 lanes; a trailing size-4 axis would
waste 124 of them).

Mirrors the role of ``ff_ext::BabyBearExt4`` in the reference (SURVEY.md §2.9).
W = 11 is verified irreducible (quartic non-residue) at build time; see
tests/test_fields.py.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import babybear as bb

DEGREE = 4
W = 11  # x^4 = W
W_MONTY = bb.const(W)

# Frobenius constants: (x^i)^(p^k) = x^i * FROB[k][i]
# x^p = x * W^((p-1)/4)  =>  FROB[k][i] = W^(i * k * (p-1)/4) mod p
_FROB_BASE = pow(W, (bb.P - 1) // 4, bb.P)
FROB = [
    [pow(_FROB_BASE, i * k, bb.P) for i in range(4)]
    for k in range(4)
]
FROB_MONTY = [[bb.const(c) for c in row] for row in FROB]


def from_base(a):
    """Base-field array -> ext array with zero high components."""
    z = jnp.zeros_like(a)
    return jnp.stack([a, z, z, z])


def zeros(shape):
    return jnp.zeros((4,) + tuple(shape), bb.DTYPE)


def ones(shape):
    out = jnp.zeros((4,) + tuple(shape), bb.DTYPE)
    return out.at[0].set(bb.MONTY_ONE)


def full(shape, coeffs):
    """Ext array with every entry equal to canonical coefficients ``coeffs``."""
    c = list(coeffs) + [0] * (4 - len(coeffs))
    return jnp.stack([bb.full(shape, v) for v in c])


def add(a, b):
    return bb.add(a, b)


def sub(a, b):
    return bb.sub(a, b)


def neg(a):
    return bb.neg(a)


def mul(a, b):
    """Ext4 x Ext4 product (schoolbook + binomial reduction, 16+3 base muls)."""
    a0, a1, a2, a3 = a[0], a[1], a[2], a[3]
    b0, b1, b2, b3 = b[0], b[1], b[2], b[3]
    m = bb.mul
    w = lambda x: bb.mul_const(x, W_MONTY)
    c0 = bb.add(m(a0, b0), w(bb.add(bb.add(m(a1, b3), m(a2, b2)), m(a3, b1))))
    c1 = bb.add(bb.add(m(a0, b1), m(a1, b0)), w(bb.add(m(a2, b3), m(a3, b2))))
    c2 = bb.add(bb.add(m(a0, b2), m(a1, b1)), bb.add(m(a2, b0), w(m(a3, b3))))
    c3 = bb.add(bb.add(m(a0, b3), m(a1, b2)), bb.add(m(a2, b1), m(a3, b0)))
    return jnp.stack([c0, c1, c2, c3])


def mul_base(a, b):
    """Ext4 x base product: 4 base muls. ``a`` is (4,...) ext, ``b`` base."""
    return jnp.stack([bb.mul(a[i], b) for i in range(4)])


def square(a):
    return mul(a, a)


def frobenius(a, k: int):
    """a^(p^k), componentwise scaling by precomputed constants."""
    return jnp.stack(
        [bb.mul_const(a[i], FROB_MONTY[k % 4][i]) for i in range(4)]
    )


def inv(a):
    """Ext inverse via the norm map: a^{-1} = t / N(a), t = prod of conjugates."""
    f1 = frobenius(a, 1)
    f2 = frobenius(a, 2)
    f3 = frobenius(a, 3)
    t = mul(mul(f1, f2), f3)
    norm = mul(a, t)[0]  # N(a) lies in the base field: components 1..3 vanish
    return mul_base(t, bb.inv(norm))


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


# ---------------------------------------------------------------------------
# Host-side helpers
# ---------------------------------------------------------------------------

def np_to_monty(x: np.ndarray) -> np.ndarray:
    """Canonical (4, ...) numpy -> Monty-form uint32."""
    return bb.np_to_monty(x)


def np_from_monty(x: np.ndarray) -> np.ndarray:
    return bb.np_from_monty(x)


def py_mul(a, b):
    """Reference ext4 multiply on python-int 4-tuples (canonical form)."""
    c = [0] * 7
    for i in range(4):
        for j in range(4):
            c[i + j] = (c[i + j] + a[i] * b[j]) % bb.P
    for k in range(6, 3, -1):
        c[k - 4] = (c[k - 4] + W * c[k]) % bb.P
    return tuple(c[:4])
