"""BabyBear septic extension F_p[z]/(z^7 + z - 11) and Weierstrass point ops.

Groundwork for the cross-shard RAM multiset hash (reference:
``SepticExtension``/``SepticPoint``, ceno_zkvm scheme/septic_curve.rs —
SURVEY.md §2.3): shard RAM records hash to curve points whose EC sum must
cancel across shards. gcd(7, p-1) = 1, so no binomial is irreducible over
BabyBear; z^7 = 11 - z is the reduction rule (trinomial verified irreducible
at build time, see tests).

Elements are (7,) + batch Monty uint32 arrays (component axis leading).
NOTE: the hash-to-curve CURVE PARAMETERS (a, b and the verified large
prime-order subgroup) are a round-2 item — point add/double below are generic
affine Weierstrass formulas, parameterized by (a, b); do not ship a multiset
hash without audited curve parameters.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import babybear as bb

DEGREE = 7
# z^7 = C1 - z  (from z^7 + z - 11)
_C = 11


def zeros(shape):
    return jnp.zeros((7,) + tuple(shape), bb.DTYPE)


def ones(shape):
    return jnp.zeros((7,) + tuple(shape), bb.DTYPE).at[0].set(bb.MONTY_ONE)


def from_base(a):
    z = jnp.zeros_like(a)
    return jnp.stack([a] + [z] * 6)


def add(a, b):
    return bb.add(a, b)


def sub(a, b):
    return bb.sub(a, b)


def neg(a):
    return bb.neg(a)


def mul(a, b):
    """Schoolbook product + reduction by z^7 = 11 - z."""
    c = [None] * 13
    for i in range(7):
        for j in range(7):
            t = bb.mul(a[i], b[j])
            k = i + j
            c[k] = t if c[k] is None else bb.add(c[k], t)
    # reduce degrees 12..7: z^k = 11 z^{k-7} - z^{k-6}
    for k in range(12, 6, -1):
        hi = c[k]
        c[k - 7] = bb.add(c[k - 7], bb.mul_const(hi, bb.const(_C)))
        c[k - 6] = bb.sub(c[k - 6], hi)
        c[k] = None
    return jnp.stack(c[:7])


def mul_base(a, s):
    return jnp.stack([bb.mul(a[i], s) for i in range(7)])


def square(a):
    return mul(a, a)


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
    """Fermat inverse a^(p^7 - 2) via p-power addition chain on exponent."""
    # a^(p^7-2) = a^(p^7-1-1)... direct square-and-multiply over the 217-bit
    # exponent; fine for the (rare) host-side uses.
    e = bb.P ** 7 - 2
    return pow_const(a, e)


# ---------------------------------------------------------------------------
# Affine Weierstrass point ops: y^2 = x^3 + A x + B over the septic field
# ---------------------------------------------------------------------------

def point_add(x1, y1, x2, y2):
    """Affine addition (x1,y1) + (x2,y2), distinct points, neither infinity."""
    lam = mul(sub(y2, y1), inv(sub(x2, x1)))
    x3 = sub(sub(mul(lam, lam), x1), x2)
    y3 = sub(mul(lam, sub(x1, x3)), y1)
    return x3, y3


def point_double(x1, y1, a_param):
    lam = mul(
        add(mul_base(mul(x1, x1), jnp.full((), bb.const(3), bb.DTYPE)), a_param),
        inv(add(y1, y1)),
    )
    x3 = sub(sub(mul(lam, lam), x1), x1)
    y3 = sub(mul(lam, sub(x1, x3)), y1)
    return x3, y3
