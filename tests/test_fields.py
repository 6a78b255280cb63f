"""Field kernels vs python-int ground truth (conformance tests).

Mirrors the role of the reference's ff_ext unit tests (SURVEY.md §2.9): every
op is checked against exact big-int arithmetic on random samples.
"""

import numpy as np
import jax.numpy as jnp

from ceno_tpu.fields import babybear as bb
from ceno_tpu.fields import ext4
from ceno_tpu.fields import goldilocks as gl

rng = np.random.default_rng(0)
N = 1024


def _rand_bb(n=N):
    return rng.integers(0, bb.P, size=n, dtype=np.uint32)


def test_babybear_constants():
    assert bb.P == 0x78000001
    assert (bb.P * bb.PINV) % (1 << 32) == (1 << 32) - 1
    assert bb.R == (1 << 32) % bb.P
    # two-adic root sanity
    w = bb.two_adic_root(3)
    assert pow(w, 8, bb.P) == 1 and pow(w, 4, bb.P) != 1


def test_babybear_monty_roundtrip():
    x = _rand_bb()
    xm = bb.np_to_monty(x)
    back = np.asarray(bb.from_monty(jnp.asarray(xm)))
    np.testing.assert_array_equal(back, x)
    # device to_monty matches host conversion
    dm = np.asarray(bb.to_monty(jnp.asarray(x)))
    np.testing.assert_array_equal(dm, xm)


def test_babybear_add_sub_neg():
    a, b = _rand_bb(), _rand_bb()
    am, bm = jnp.asarray(bb.np_to_monty(a)), jnp.asarray(bb.np_to_monty(b))
    s = bb.np_from_monty(np.asarray(bb.add(am, bm)))
    np.testing.assert_array_equal(s, (a.astype(np.uint64) + b) % bb.P)
    d = bb.np_from_monty(np.asarray(bb.sub(am, bm)))
    np.testing.assert_array_equal(
        d, (a.astype(np.int64) - b.astype(np.int64)) % bb.P
    )
    n = bb.np_from_monty(np.asarray(bb.neg(am)))
    np.testing.assert_array_equal(n, (-a.astype(np.int64)) % bb.P)


def test_babybear_mul():
    a, b = _rand_bb(), _rand_bb()
    am, bm = jnp.asarray(bb.np_to_monty(a)), jnp.asarray(bb.np_to_monty(b))
    m = bb.np_from_monty(np.asarray(bb.mul(am, bm)))
    np.testing.assert_array_equal(m, (a.astype(np.uint64) * b) % bb.P)


def test_babybear_mul_edge_cases():
    vals = np.array([0, 1, 2, bb.P - 1, bb.P - 2, 1 << 30], dtype=np.uint32)
    a = np.repeat(vals, len(vals))
    b = np.tile(vals, len(vals))
    am, bm = jnp.asarray(bb.np_to_monty(a)), jnp.asarray(bb.np_to_monty(b))
    m = bb.np_from_monty(np.asarray(bb.mul(am, bm)))
    np.testing.assert_array_equal(m, (a.astype(np.uint64) * b) % bb.P)


def test_babybear_inv_pow():
    a = _rand_bb(256)
    a[a == 0] = 1
    am = jnp.asarray(bb.np_to_monty(a))
    iv = np.asarray(bb.inv(am))
    prod = bb.np_from_monty(np.asarray(bb.mul(am, jnp.asarray(iv))))
    np.testing.assert_array_equal(prod, np.ones_like(a))
    p5 = bb.np_from_monty(np.asarray(bb.pow_const(am, 5)))
    expect = np.array([pow(int(v), 5, bb.P) for v in a], dtype=np.uint32)
    np.testing.assert_array_equal(p5, expect)


def test_ext4_mul_vs_pyint():
    n = 64
    a = rng.integers(0, bb.P, size=(4, n), dtype=np.uint32)
    b = rng.integers(0, bb.P, size=(4, n), dtype=np.uint32)
    am, bm = jnp.asarray(ext4.np_to_monty(a)), jnp.asarray(ext4.np_to_monty(b))
    c = ext4.np_from_monty(np.asarray(ext4.mul(am, bm)))
    for i in range(n):
        expect = ext4.py_mul(tuple(int(v) for v in a[:, i]), tuple(int(v) for v in b[:, i]))
        assert tuple(int(v) for v in c[:, i]) == expect, f"col {i}"


def test_ext4_inv():
    n = 64
    a = rng.integers(1, bb.P, size=(4, n), dtype=np.uint32)
    am = jnp.asarray(ext4.np_to_monty(a))
    iv = ext4.inv(am)
    prod = ext4.np_from_monty(np.asarray(ext4.mul(am, iv)))
    np.testing.assert_array_equal(prod[0], np.ones(n, np.uint32))
    np.testing.assert_array_equal(prod[1:], np.zeros((3, n), np.uint32))


def test_ext4_mul_base_and_frobenius():
    n = 64
    a = rng.integers(0, bb.P, size=(4, n), dtype=np.uint32)
    s = rng.integers(0, bb.P, size=n, dtype=np.uint32)
    am = jnp.asarray(ext4.np_to_monty(a))
    sm = jnp.asarray(bb.np_to_monty(s))
    c = ext4.np_from_monty(np.asarray(ext4.mul_base(am, sm)))
    expect = (a.astype(np.uint64) * s.astype(np.uint64)) % bb.P
    np.testing.assert_array_equal(c, expect.astype(np.uint32))
    # frobenius is a field automorphism: frob(a*b) == frob(a)*frob(b)
    b = rng.integers(0, bb.P, size=(4, n), dtype=np.uint32)
    bm = jnp.asarray(ext4.np_to_monty(b))
    lhs = np.asarray(ext4.frobenius(ext4.mul(am, bm), 1))
    rhs = np.asarray(ext4.mul(ext4.frobenius(am, 1), ext4.frobenius(bm, 1)))
    np.testing.assert_array_equal(lhs, rhs)
    # frob^4 = identity
    f4 = np.asarray(
        ext4.frobenius(ext4.frobenius(ext4.frobenius(ext4.frobenius(am, 1), 1), 1), 1)
    )
    np.testing.assert_array_equal(f4, np.asarray(am))


def _rand_gl(n=256):
    return rng.integers(0, gl.P, size=n, dtype=np.uint64)


def test_goldilocks_add_sub_mul():
    a, b = _rand_gl(), _rand_gl()
    ap, bp = jnp.asarray(gl.np_pack(a)), jnp.asarray(gl.np_pack(b))
    s = gl.np_unpack(np.asarray(gl.add(ap, bp)))
    expect = np.array([(int(x) + int(y)) % gl.P for x, y in zip(a, b)], np.uint64)
    np.testing.assert_array_equal(s, expect)
    d = gl.np_unpack(np.asarray(gl.sub(ap, bp)))
    expect = np.array([(int(x) - int(y)) % gl.P for x, y in zip(a, b)], np.uint64)
    np.testing.assert_array_equal(d, expect)
    m = gl.np_unpack(np.asarray(gl.mul(ap, bp)))
    expect = np.array([(int(x) * int(y)) % gl.P for x, y in zip(a, b)], np.uint64)
    np.testing.assert_array_equal(m, expect)


def test_goldilocks_edge_cases():
    vals = np.array([0, 1, gl.P - 1, gl.P - 2, (1 << 32) - 1, 1 << 32, (1 << 63)],
                    dtype=np.uint64)
    a = np.repeat(vals, len(vals))
    b = np.tile(vals, len(vals))
    ap, bp = jnp.asarray(gl.np_pack(a)), jnp.asarray(gl.np_pack(b))
    m = gl.np_unpack(np.asarray(gl.mul(ap, bp)))
    expect = np.array([(int(x) * int(y)) % gl.P for x, y in zip(a, b)], np.uint64)
    np.testing.assert_array_equal(m, expect)
    iv = gl.np_unpack(np.asarray(gl.inv(jnp.asarray(gl.np_pack(np.array([3], np.uint64))))))
    assert (int(iv[0]) * 3) % gl.P == 1


def test_goldilocks_ext2():
    from ceno_tpu.fields import goldilocks_ext2 as ge
    n = 64
    a0 = rng.integers(0, gl.P, size=n, dtype=np.uint64)
    a1 = rng.integers(0, gl.P, size=n, dtype=np.uint64)
    b0 = rng.integers(0, gl.P, size=n, dtype=np.uint64)
    b1 = rng.integers(1, gl.P, size=n, dtype=np.uint64)
    a = jnp.asarray(ge.np_pack(a0, a1))
    b = jnp.asarray(ge.np_pack(b0, b1))
    c0, c1 = ge.np_unpack(np.asarray(ge.mul(a, b)))
    for i in (0, 1, 63):
        e0, e1 = ge.py_mul((int(a0[i]), int(a1[i])), (int(b0[i]), int(b1[i])))
        assert (int(c0[i]), int(c1[i])) == (e0, e1)
    # inverse roundtrip
    iv = ge.inv(b)
    p0, p1 = ge.np_unpack(np.asarray(ge.mul(b, iv)))
    np.testing.assert_array_equal(p0, np.ones(n, np.uint64))
    np.testing.assert_array_equal(p1, np.zeros(n, np.uint64))


def test_septic_field_reference_vectors():
    """Parameter-set conformance vs scheme/septic_curve.rs test vectors:
    z * (z^6+z^5+z^4) = 5 + 2z + z^5 + z^6 in F_p[z]/(z^7 - 2z - 5)."""
    from ceno_tpu.fields import septic as S

    a = np.array([0, 1, 0, 0, 0, 0, 0], np.uint64)
    b = np.array([0, 0, 0, 0, 1, 1, 1], np.uint64)
    c = np.array([5, 2, 0, 0, 0, 1, 1], np.uint64)
    np.testing.assert_array_equal(S.mul(a, b), c)
    # a^(p^2) == (a^p)^p
    np.testing.assert_array_equal(S.double_frobenius(c), S.frobenius(S.frobenius(c)))
    # norm_sub(c) * c must be in the base field
    nrm = S.mul(S.norm_sub(c), c)
    assert (nrm[1:] == 0).all()
    # sqrt roundtrip on random squares (batch)
    d = rng.integers(1, bb.P, size=(6, 7), dtype=np.uint32).astype(np.uint64)
    e = S.square(d)
    root, ok = S.sqrt(e)
    assert ok.all()
    for i in range(6):
        assert np.array_equal(root[i], d[i]) or np.array_equal(root[i], S.neg(d[i]))
    # inverse roundtrip
    iv = S.inv(d)
    np.testing.assert_array_equal(S.mul(d, iv), S.one((6,)))


def test_septic_curve_ops():
    from ceno_tpu.fields import septic as S

    # hash-to-curve style: find points from random x
    pts = []
    trial = rng.integers(0, bb.P, size=(64, 7), dtype=np.uint32).astype(np.uint64)
    y, ok = S.from_x(trial)
    assert ok.any() and not ok.all()  # ~half are squares
    xs = trial[ok][:4]
    ys = y[ok][:4]
    assert S.is_on_curve(xs, ys).all()
    p0 = (xs[0], ys[0])
    p1 = (xs[1], ys[1])
    p2 = (xs[2], ys[2])
    # P + (-P) = infinity
    sx, sy = S.point_add(p0, S.point_neg(*p0))
    assert S.is_infinity(sx, sy)
    # associativity (P+Q)+R == P+(Q+R)
    l = S.point_add(S.point_add(p0, p1), p2)
    r = S.point_add(p0, S.point_add(p1, p2))
    np.testing.assert_array_equal(l[0], r[0])
    np.testing.assert_array_equal(l[1], r[1])
    # batched add matches scalar add and returns the correct slope
    x3, y3, lam = S.point_add_batch(
        xs[0][None], ys[0][None], xs[1][None], ys[1][None]
    )
    e = S.point_add(p0, p1)
    np.testing.assert_array_equal(x3[0], e[0])
    np.testing.assert_array_equal(y3[0], e[1])
    np.testing.assert_array_equal(
        S.mul(lam[0], S.sub(xs[1], xs[0])), S.sub(ys[1], ys[0])
    )
    # infinity operands short-circuit
    inf = np.zeros(7, np.uint64)
    x3, y3, lam = S.point_add_batch(inf[None], inf[None], xs[0][None], ys[0][None])
    np.testing.assert_array_equal(x3[0], xs[0])
    np.testing.assert_array_equal(y3[0], ys[0])
