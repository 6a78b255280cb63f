"""Quintic Goldilocks extension + multiset-hash curve (fields/gl5_host.py).

Mirrors the septic field/curve tests' strategy (tests/test_septic.py
pattern) for the GL configuration: field axioms against a python-int
reference, frobenius = pow(p), sqrt/inv roundtrips, curve group laws, and —
the end-to-end check of the PINNED constants — CURVE_ORDER * random point
== infinity via the zeta-function order (tools/find_gl5_curve.py)."""

import numpy as np
import pytest

from ceno_tpu.fields import gl5_host as F
from ceno_tpu.fields import gl_host as gl

P = F.P
rng = np.random.default_rng(7)


def rand_elems(n):
    return (rng.integers(0, 1 << 63, (n, 5), dtype=np.uint64) * 2
            + rng.integers(0, 2, (n, 5), dtype=np.uint64)) % np.uint64(P)


def ref_mul(a, b):
    """python-int schoolbook reference, z^5 = 3."""
    out = [0] * 9
    for i in range(5):
        for j in range(5):
            out[i + j] += int(a[i]) * int(b[j])
    for k in range(8, 4, -1):
        out[k - 5] += 3 * out[k]
    return np.array([v % P for v in out[:5]], np.uint64)


def test_mul_matches_reference():
    a = rand_elems(20)
    b = rand_elems(20)
    got = F.mul(a, b)
    for i in range(20):
        assert np.array_equal(got[i], ref_mul(a[i], b[i]))


def test_ring_axioms():
    a, b, c = rand_elems(8), rand_elems(8), rand_elems(8)
    assert np.array_equal(F.mul(a, b), F.mul(b, a))
    assert np.array_equal(F.mul(F.mul(a, b), c), F.mul(a, F.mul(b, c)))
    assert np.array_equal(
        F.mul(a, F.add(b, c)), F.add(F.mul(a, b), F.mul(a, c))
    )
    assert np.array_equal(F.mul(a, F.one((8,))), a)


def test_frobenius_is_pow_p():
    a = rand_elems(4)
    assert np.array_equal(F.frobenius(a), F.pow_int(a, P))
    assert np.array_equal(F.double_frobenius(a), F.pow_int(a, P * P))


def test_norm_lands_in_base_and_inv():
    a = rand_elems(6)
    ns = F.mul(F.norm_sub(a), a)
    assert not ns[..., 1:].any()  # norm is base-field
    assert np.array_equal(F.mul(a, F.inv(a)), F.one((6,)))


def test_sqrt_roundtrip():
    a = rand_elems(16)
    sq = F.square(a)
    root, ok = F.sqrt(sq)
    assert ok.all()
    # root is +-a
    same = np.all(root == a, axis=-1) | np.all(root == F.neg(a), axis=-1)
    assert same.all()


def test_is_square_euler():
    a = rand_elems(10)
    sq = F.square(a)
    assert F.is_square(sq).all()
    # a non-square: multiply a square by the non-residue z (z = x^(1/5)-ish;
    # z is a square iff norm(z) = 3^... — just test consistency with sqrt)
    z = F.zeros((10,))
    z[:, 1] = 1
    cand = F.mul(sq, z)
    issq = F.is_square(cand)
    _, ok = F.sqrt(cand)
    assert np.array_equal(issq, ok)


def test_curve_point_from_x_on_curve():
    xs = rand_elems(32)
    y, ok = F.from_x(xs)
    assert ok.any()
    good = np.nonzero(ok)[0]
    assert F.is_on_curve(xs[good], y[good]).all()


def _rand_curve_point():
    while True:
        x = rand_elems(1)
        y, ok = F.from_x(x)
        if ok[0]:
            return x[0], y[0]


def test_point_add_group_laws():
    p1 = _rand_curve_point()
    p2 = _rand_curve_point()
    p3 = _rand_curve_point()
    s12 = F.point_add(p1, p2)
    s21 = F.point_add(p2, p1)
    assert np.array_equal(s12[0], s21[0]) and np.array_equal(s12[1], s21[1])
    lhs = F.point_add(F.point_add(p1, p2), p3)
    rhs = F.point_add(p1, F.point_add(p2, p3))
    assert np.array_equal(lhs[0], rhs[0]) and np.array_equal(lhs[1], rhs[1])
    # P + (-P) = infinity
    negp = (p1[0], F.neg(p1[1]))
    s = F.point_add(p1, negp)
    assert F.is_infinity(s[0][None], s[1][None])[0]
    # infinity identity
    inf = (np.zeros(5, np.uint64), np.zeros(5, np.uint64))
    s = F.point_add(p1, inf)
    assert np.array_equal(s[0], p1[0]) and np.array_equal(s[1], p1[1])


def _scalar_mul(k, pt):
    acc = (np.zeros(5, np.uint64), np.zeros(5, np.uint64))
    dbl = pt
    while k:
        if k & 1:
            acc = F.point_add(acc, dbl)
        dbl = F.point_add(dbl, dbl)
        k >>= 1
    return acc


@pytest.mark.parametrize("seed", [0])
def test_pinned_group_order_kills_points(seed):
    """CURVE_ORDER * P == infinity: end-to-end validation of the pinned
    zeta-function order (and hence the security analysis built on it)."""
    global rng
    rng = np.random.default_rng(100 + seed)
    pt = _rand_curve_point()
    s = _scalar_mul(F.CURVE_ORDER, pt)
    assert F.is_infinity(s[0][None], s[1][None])[0]
    # ... and the prime alone does NOT kill a generic point (cofactor part)
    s = _scalar_mul(F.CURVE_PRIME, pt)
    assert not F.is_infinity(s[0][None], s[1][None])[0]


def test_point_add_batch_matches_single():
    pts = [_rand_curve_point() for _ in range(6)]
    x1 = np.stack([p[0] for p in pts[:3]])
    y1 = np.stack([p[1] for p in pts[:3]])
    x2 = np.stack([p[0] for p in pts[3:]])
    y2 = np.stack([p[1] for p in pts[3:]])
    x3, y3, lam = F.point_add_batch(x1, y1, x2, y2)
    for i in range(3):
        ref = F.point_add((x1[i], y1[i]), (x2[i], y2[i]))
        assert np.array_equal(x3[i], ref[0]) and np.array_equal(y3[i], ref[1])
        # slope definition
        assert np.array_equal(
            F.mul(lam[i], F.sub(x2[i], x1[i])), F.sub(y2[i], y1[i])
        )
