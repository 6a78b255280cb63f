"""MLE ops and sumcheck prove/verify roundtrips against brute-force sums."""

import numpy as np
import pytest
import jax.numpy as jnp

from ceno_tpu.fields import babybear as bb
from ceno_tpu.fields import ext4, ext4_host as exth
from ceno_tpu.mle import ops
from ceno_tpu.hash import Transcript
from ceno_tpu import sumcheck
from ceno_tpu.sumcheck import TermSpec

rng = np.random.default_rng(11)


def _rand_base_mle(n_vars):
    return rng.integers(0, bb.P, size=1 << n_vars, dtype=np.uint32)


def _rand_ext_mle(n_vars):
    return rng.integers(0, bb.P, size=(4, 1 << n_vars), dtype=np.uint32)


def _host_eval_mle(vals, point):
    """Brute-force MLE evaluation: vals (N,4) ext canonical, point (n, 4)."""
    cur = np.asarray(vals, np.uint64)
    n = point.shape[0]
    for j in range(n - 1, -1, -1):
        half = cur.shape[0] // 2
        lo, hi = cur[:half], cur[half:]
        cur = exth.add(lo, exth.mul(point[j][None, :], exth.sub(hi, lo)))
    return cur[0]


def test_fold_and_evaluate_consistency():
    n_vars = 6
    m = _rand_base_mle(n_vars)
    md = jnp.asarray(bb.np_to_monty(m))
    point = rng.integers(0, bb.P, size=(n_vars, 4), dtype=np.uint32)
    pd = jnp.asarray(bb.np_to_monty(point))
    got = bb.np_from_monty(np.asarray(ops.evaluate(md, pd))).astype(np.uint64)
    expect = _host_eval_mle(exth.from_base(m), point.astype(np.uint64))
    np.testing.assert_array_equal(got, expect)


def test_build_eq_matches_pointwise():
    n_vars = 5
    point = rng.integers(0, bb.P, size=(n_vars, 4), dtype=np.uint32).astype(np.uint64)
    pd = jnp.asarray(bb.np_to_monty(point))
    eq = bb.np_from_monty(np.asarray(ops.build_eq(pd))).astype(np.uint64)  # (4, N)
    for i in [0, 1, 7, 19, 31]:
        bits = [(i >> j) & 1 for j in range(n_vars)]
        expect = exth.one()
        for j, b in enumerate(bits):
            term = point[j] if b else exth.sub(exth.from_base(1), point[j])
            expect = exth.mul(expect, term)
        np.testing.assert_array_equal(eq[:, i], expect)


def test_build_eq_evaluates_to_eq_eval():
    n_vars = 4
    a = rng.integers(0, bb.P, size=(n_vars, 4), dtype=np.uint32).astype(np.uint64)
    b = rng.integers(0, bb.P, size=(n_vars, 4), dtype=np.uint32).astype(np.uint64)
    eq_table = ops.build_eq(jnp.asarray(bb.np_to_monty(a)))
    v = bb.np_from_monty(
        np.asarray(ops.evaluate(eq_table, jnp.asarray(bb.np_to_monty(b))))
    ).astype(np.uint64)
    np.testing.assert_array_equal(v, exth.eq_eval(a, b))


def _brute_force_claim(base_cols, ext_cols, term_list):
    """Exact claimed sum on host."""
    acc = np.zeros(4, np.uint64)
    n = len(base_cols[0]) if base_cols else ext_cols[0].shape[1]
    for t in term_list:
        prod = np.tile(exth.one(), (n, 1))
        for j in t.bidx:
            prod = exth.mul_base(prod, base_cols[j].astype(np.uint64))
        for j in t.eidx:
            prod = exth.mul(prod, ext_cols[j].T.astype(np.uint64))
        total = prod.sum(axis=0) % np.uint64(bb.P)  # n * p < 2^64: no overflow
        acc = exth.add(acc, exth.mul(np.asarray(t.scalar, np.uint64), total))
    return acc


def _roundtrip(n_vars, base_cols, ext_cols, term_list):
    claim = _brute_force_claim(base_cols, ext_cols, term_list)
    dev_base = [jnp.asarray(bb.np_to_monty(c)) for c in base_cols]
    dev_ext = [jnp.asarray(bb.np_to_monty(c)) for c in ext_cols]
    tp = Transcript(b"sumcheck-test")
    out = sumcheck.prove(dev_base, dev_ext, term_list, n_vars, tp)
    tv = Transcript(b"sumcheck-test")
    point, final_claim = sumcheck.verify(claim, out.proof.round_msgs, n_vars, tv)
    np.testing.assert_array_equal(point, out.point)
    # recombine: sum_t scalar * prod(col evals at point) == final_claim
    acc = np.zeros(4, np.uint64)
    for t in term_list:
        prod = np.asarray(t.scalar, np.uint64)
        for j in t.bidx:
            prod = exth.mul(prod, out.final_base[j])
        for j in t.eidx:
            prod = exth.mul(prod, out.final_ext[j])
        acc = exth.add(acc, prod)
    np.testing.assert_array_equal(acc, final_claim)
    # final evals really are the MLE evaluations at the point
    for j, c in enumerate(base_cols):
        np.testing.assert_array_equal(
            out.final_base[j],
            _host_eval_mle(exth.from_base(c), point.astype(np.uint64)),
        )
    for j, c in enumerate(ext_cols):
        np.testing.assert_array_equal(
            out.final_ext[j],
            _host_eval_mle(c.T.astype(np.uint64), point.astype(np.uint64)),
        )


def test_sumcheck_base_only():
    n_vars = 7
    base_cols = [_rand_base_mle(n_vars) for _ in range(3)]
    terms = [
        TermSpec(exth.from_base(2), bidx=(0, 1)),
        TermSpec(exth.from_base(3), bidx=(2,)),
    ]
    _roundtrip(n_vars, base_cols, [], terms)


def test_sumcheck_mixed_degree3():
    n_vars = 6
    base_cols = [_rand_base_mle(n_vars) for _ in range(3)]
    ext_cols = [_rand_ext_mle(n_vars)]
    alpha = rng.integers(0, bb.P, size=4).astype(np.uint64)
    terms = [
        TermSpec(alpha, bidx=(0, 1), eidx=(0,)),
        TermSpec(exth.from_base(5), bidx=(2,), eidx=(0,)),
        TermSpec(exth.from_base(1), eidx=(0,)),
    ]
    _roundtrip(n_vars, base_cols, ext_cols, terms)


def test_sumcheck_large_scan_path(monkeypatch):
    # force the DEVICE scan path even under the test-wide host threshold
    from ceno_tpu.sumcheck import host_impl

    monkeypatch.setattr(host_impl, "HOST_N", 512)
    n_vars = 13
    base_cols = [_rand_base_mle(n_vars) for _ in range(2)]
    terms = [TermSpec(exth.from_base(7), bidx=(0, 1))]
    _roundtrip(n_vars, base_cols, [], terms)


def test_sumcheck_rejects_wrong_claim():
    n_vars = 5
    base_cols = [_rand_base_mle(n_vars)]
    terms = [TermSpec(exth.from_base(1), bidx=(0,))]
    dev_base = [jnp.asarray(bb.np_to_monty(c)) for c in base_cols]
    tp = Transcript(b"sumcheck-test")
    out = sumcheck.prove(dev_base, [], terms, n_vars, tp)
    bad_claim = exth.add(_brute_force_claim(base_cols, [], terms), exth.from_base(1))
    tv = Transcript(b"sumcheck-test")
    try:
        sumcheck.verify(bad_claim, out.proof.round_msgs, n_vars, tv)
        assert False, "should have raised"
    except sumcheck.verifier.SumcheckError:
        pass


def test_sumcheck_fused_matches_unfused(monkeypatch):
    """CENO_TPU_FUSED=1 (on-device transcript, one program) must produce
    byte-identical proofs to the per-round path."""
    from ceno_tpu.sumcheck import host_impl

    n_vars = 9
    base_cols = [_rand_base_mle(n_vars) for _ in range(3)]
    terms = [
        TermSpec(exth.from_base(2), bidx=(0, 1)),
        TermSpec(exth.from_base(9), bidx=(1, 2)),
    ]
    monkeypatch.setattr(host_impl, "HOST_N", 32)
    monkeypatch.setenv("CENO_TPU_FUSED", "0")
    dev = [jnp.asarray(bb.np_to_monty(c)) for c in base_cols]
    un = sumcheck.prove(list(dev), [], terms, n_vars, Transcript(b"fused-test"))
    monkeypatch.setenv("CENO_TPU_FUSED", "1")
    fu = sumcheck.prove(list(dev), [], terms, n_vars, Transcript(b"fused-test"))
    np.testing.assert_array_equal(un.proof.round_msgs, fu.proof.round_msgs)
    np.testing.assert_array_equal(un.final_base, fu.final_base)
    np.testing.assert_array_equal(un.point, fu.point)


@pytest.mark.slow
def test_sumcheck_fused_head_rounds_match(monkeypatch):
    """Unrolled-head + scan-stage split must stay byte-identical to the
    per-round path at every head depth."""
    from ceno_tpu.sumcheck import host_impl, fused

    n_vars = 9
    base_cols = [_rand_base_mle(n_vars) for _ in range(2)]
    ext_cols = [_rand_ext_mle(n_vars)]
    terms = [
        TermSpec(exth.from_base(3), bidx=(0, 1), eidx=(0,)),
        TermSpec(exth.from_base(11), eidx=(0,)),
    ]
    monkeypatch.setattr(host_impl, "HOST_N", 32)
    monkeypatch.setenv("CENO_TPU_FUSED", "0")
    dev_b = [jnp.asarray(bb.np_to_monty(c)) for c in base_cols]
    dev_e = [jnp.asarray(bb.np_to_monty(c)) for c in ext_cols]
    un = sumcheck.prove(
        list(dev_b), list(dev_e), terms, n_vars, Transcript(b"fused-head")
    )
    monkeypatch.setenv("CENO_TPU_FUSED", "1")
    for scan_max in (4, 6, 20):  # head = 4, 2, 0
        monkeypatch.setattr(fused, "SCAN_MAX_LOG", scan_max)
        fu = sumcheck.prove(
            list(dev_b), list(dev_e), terms, n_vars, Transcript(b"fused-head")
        )
        np.testing.assert_array_equal(un.proof.round_msgs, fu.proof.round_msgs)
        np.testing.assert_array_equal(un.final_ext, fu.final_ext)
        np.testing.assert_array_equal(un.point, fu.point)
