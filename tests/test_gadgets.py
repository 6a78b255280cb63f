"""In-circuit ext4 gadgets (recursion building blocks, RECURSION.md #1):
ext4 multiplication and the Lagrange-extrapolation gadget — the per-round
core of a recursive sumcheck verifier — checked row-wise with MockProver
and cross-checked against the host verifier's extrapolation."""

import numpy as np

from ceno_tpu.fields import babybear as bb
from ceno_tpu.fields import ext4_host as exth
from ceno_tpu.gkr import gadgets as G
from ceno_tpu.gkr.chip import compile_chip
from ceno_tpu.gkr.circuit_builder import CircuitBuilder
from ceno_tpu.gkr.mock import MockProver
from ceno_tpu.sumcheck.verifier import lagrange_extrapolate

rng = np.random.default_rng(13)
DEG = 3


def _rand_ext(shape):
    return rng.integers(0, bb.P, size=tuple(shape) + (4,)).astype(np.uint64)


def _build_mul_chip():
    cb = CircuitBuilder("ext_mul_gadget")
    a = G.ext_witness(cb, "a")
    b = G.ext_witness(cb, "b")
    c = G.ext_mul(cb, "c", a, b)
    # one extra linear op: d = a + 2*c must equal the witness d
    d = G.ext_witness(cb, "d")
    G.ext_require_equal(cb, "lin", a.add(c.scale(2)), d)
    return cb


def _assign_mul(cb, n):
    a = _rand_ext((n,))
    b = _rand_ext((n,))
    c = G.ext_mul_host(a, b)
    two = exth.from_base(np.full(n, 2, np.uint64))
    d = exth.add(a, exth.mul(two, c))
    cols = {}
    for name, v in (("a", a), ("b", b), ("c", c), ("d", d)):
        G.assign_ext(cols, name, v)
    wit = np.zeros((len(cb.wit_names), n), np.uint64)
    for i, name in enumerate(cb.wit_names):
        wit[i] = cols[name]
    return wit, a, b


def test_ext_mul_gadget_mock():
    cb = _build_mul_chip()
    compiled = compile_chip(cb)
    n = 8
    wit, _, _ = _assign_mul(cb, n)
    chips = [(compiled, cb, wit, np.zeros((0, n), np.uint64), np.zeros(0), n)]
    assert MockProver.assert_satisfied(chips) == []
    bad = wit.copy()
    ci = cb.wit_names.index("c_2")
    bad[ci, 3] = (int(bad[ci, 3]) + 1) % bb.P
    chips_bad = [(compiled, cb, bad, np.zeros((0, n), np.uint64), np.zeros(0), n)]
    errs = MockProver.assert_satisfied(chips_bad, raise_on_error=False)
    assert errs and any(e.row == 3 for e in errs)


def _build_lagrange_chip():
    cb = CircuitBuilder("lagrange_gadget")
    ys = [G.ext_witness(cb, f"y{k}") for k in range(DEG + 1)]
    r = G.ext_witness(cb, "r")
    G.lagrange_extrapolate_gadget(cb, "lag", ys, r, DEG)
    return cb


def test_lagrange_gadget_matches_host_verifier():
    cb = _build_lagrange_chip()
    compiled = compile_chip(cb)
    n = 4
    ys = _rand_ext((n, DEG + 1))
    r = _rand_ext((n,))
    cols = {}
    for k in range(DEG + 1):
        G.assign_ext(cols, f"y{k}", ys[:, k])
    G.assign_ext(cols, "r", r)
    out = G.assign_lagrange(cols, "lag", ys, r, DEG)
    wit = np.zeros((len(cb.wit_names), n), np.uint64)
    for i, name in enumerate(cb.wit_names):
        assert name in cols, name
        wit[i] = cols[name]
    chips = [(compiled, cb, wit, np.zeros((0, n), np.uint64), np.zeros(0), n)]
    assert MockProver.assert_satisfied(chips) == []
    # the in-circuit value equals the host verifier's extrapolation
    for row in range(n):
        expect = lagrange_extrapolate(ys[row], r[row])
        assert np.array_equal(out[row], expect)
    # tamper: a wrong claimed output must violate a constraint
    oi = cb.wit_names.index("lag_out_0")
    wit[oi, 1] = (int(wit[oi, 1]) + 1) % bb.P
    errs = MockProver.assert_satisfied(
        [(compiled, cb, wit, np.zeros((0, n), np.uint64), np.zeros(0), n)],
        raise_on_error=False,
    )
    assert errs and any(e.row == 1 for e in errs)
