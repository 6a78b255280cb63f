"""Goldilocks quadratic extension F_p[x]/(x^2 - 7) as vectorized TPU kernels.

Mirror of the reference's ``ff_ext::GoldilocksExt2`` (SURVEY.md §2.9), the
optional field configuration (BabyBear is the default proving field).
Elements are stored (2 components, 2 limbs, batch...) of uint32 — see
fields/goldilocks.py for the limb convention. W = 7 verified irreducible.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import goldilocks as gl

DEGREE = 2
W = 7


def from_base(a):
    """(2, ...) base -> (2, 2, ...) ext with zero second component."""
    return jnp.stack([a, jnp.zeros_like(a)])


def zeros(shape):
    return jnp.zeros((2, 2) + tuple(shape), gl.DTYPE)


def ones(shape):
    return jnp.stack([gl.ones(shape), gl.zeros(shape)])


def add(a, b):
    return jnp.stack([gl.add(a[0], b[0]), gl.add(a[1], b[1])])


def sub(a, b):
    return jnp.stack([gl.sub(a[0], b[0]), gl.sub(a[1], b[1])])


def neg(a):
    return jnp.stack([gl.neg(a[0]), gl.neg(a[1])])


def _mul_w(x):
    """7*x via shift-and-add (8x - x)."""
    x2 = gl.add(x, x)
    x4 = gl.add(x2, x2)
    x8 = gl.add(x4, x4)
    return gl.sub(x8, x)


def mul(a, b):
    """(a0 + a1 x)(b0 + b1 x) = a0b0 + 7 a1b1 + (a0b1 + a1b0) x."""
    a0, a1 = a[0], a[1]
    b0, b1 = b[0], b[1]
    c0 = gl.add(gl.mul(a0, b0), _mul_w(gl.mul(a1, b1)))
    c1 = gl.add(gl.mul(a0, b1), gl.mul(a1, b0))
    return jnp.stack([c0, c1])


def mul_base(a, s):
    return jnp.stack([gl.mul(a[0], s), gl.mul(a[1], s)])


def square(a):
    return mul(a, a)


def inv(a):
    """(a0 - a1 x) / (a0^2 - 7 a1^2)."""
    norm = gl.sub(gl.mul(a[0], a[0]), _mul_w(gl.mul(a[1], a[1])))
    ninv = gl.inv(norm)
    return jnp.stack([gl.mul(a[0], ninv), gl.neg(gl.mul(a[1], ninv))])


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
        return ones(jnp.shape(a)[2:])
    return result


# host helpers
def np_pack(c0, c1) -> np.ndarray:
    return np.stack([gl.np_pack(c0), gl.np_pack(c1)])


def np_unpack(x: np.ndarray):
    return gl.np_unpack(x[0]), gl.np_unpack(x[1])


def py_mul(a: tuple, b: tuple) -> tuple:
    c0 = (a[0] * b[0] + W * a[1] * b[1]) % gl.P
    c1 = (a[0] * b[1] + a[1] * b[0]) % gl.P
    return c0, c1
