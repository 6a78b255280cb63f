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


def test_septic_field():
    import sympy
    from sympy.abc import x as _x
    from ceno_tpu.fields import septic

    assert sympy.Poly(_x**7 + _x - 11, _x, modulus=bb.P).is_irreducible
    n = 8
    a = rng.integers(1, bb.P, size=(7, n), dtype=np.uint32)
    b = rng.integers(1, bb.P, size=(7, n), dtype=np.uint32)
    am = jnp.asarray(bb.np_to_monty(a))
    bm = jnp.asarray(bb.np_to_monty(b))
    # ring laws: commutativity + distributivity (spot)
    ab = np.asarray(septic.mul(am, bm))
    ba = np.asarray(septic.mul(bm, am))
    np.testing.assert_array_equal(ab, ba)
    # vs python-int reference reduction
    def py_mul(u, v):
        c = [0] * 13
        for i in range(7):
            for j in range(7):
                c[i + j] = (c[i + j] + int(u[i]) * int(v[j])) % bb.P
        for k in range(12, 6, -1):
            c[k - 7] = (c[k - 7] + 11 * c[k]) % bb.P
            c[k - 6] = (c[k - 6] - c[k]) % bb.P
        return [v % bb.P for v in c[:7]]
    got = bb.np_from_monty(ab)
    for col in (0, n - 1):
        assert [int(v) for v in got[:, col]] == py_mul(a[:, col], b[:, col])
    # inverse roundtrip (single element: the 217-bit pow is slow-ish)
    one = bb.np_from_monty(
        np.asarray(septic.mul(am[:, :1], septic.inv(am[:, :1])))
    )
    assert [int(v) for v in one[:, 0]] == [1, 0, 0, 0, 0, 0, 0]
