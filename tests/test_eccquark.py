"""Quark EC-sum proof: tree witgen, prove/verify, opening-claim geometry."""

import numpy as np
import pytest

from ceno_tpu.fields import babybear as bb
from ceno_tpu.fields import ext4_host as exth
from ceno_tpu.fields import septic as S
from ceno_tpu.gkr import eccquark as Q
from ceno_tpu.hash import Transcript

rng = np.random.default_rng(55)


def _random_points(k):
    xs, ys = [], []
    while len(xs) < k:
        trial = rng.integers(0, bb.P, size=(2 * k + 4, 7), dtype=np.uint32).astype(np.uint64)
        y, ok = S.from_x(trial)
        for i in np.nonzero(ok)[0]:
            if len(xs) < k:
                xs.append(trial[i])
                ys.append(y[i])
    return np.stack(xs), np.stack(ys)


def _host_sum(xs, ys):
    acc = (np.zeros(7, np.uint64), np.zeros(7, np.uint64))
    for i in range(xs.shape[0]):
        acc = S.point_add(acc, (xs[i], ys[i]))
    return np.stack(acc)


@pytest.mark.parametrize("n_pts,n_rows", [(8, 16), (5, 16), (1, 8), (13, 32)])
def test_tree_witness_final_sum(n_pts, n_rows):
    xs, ys = _random_points(n_pts)
    x, y, s, final = Q.build_tree_witness(xs, ys, n_rows)
    expect = _host_sum(xs, ys)
    np.testing.assert_array_equal(final, expect)


def test_quark_prove_verify_roundtrip():
    n_pts, n_rows = 11, 32
    xs, ys = _random_points(n_pts)
    x, y, s, final = Q.build_tree_witness(xs, ys, n_rows)
    tp = Transcript(b"ecc-test")
    proof, _rt = Q.prove_ec_sum(x, y, s, n_pts, final, tp)
    tv = Transcript(b"ecc-test")
    rt, evals = Q.verify_ec_sum(proof, final, tv)

    # view evals equal the committed-column MLEs at the extended points
    def mle_eval(col, point):
        cur = exth.from_base(col.astype(np.uint64))
        for j in range(point.shape[0] - 1, -1, -1):
            half = cur.shape[0] // 2
            lo, hi = cur[:half], cur[half:]
            cur = exth.add(lo, exth.mul(point[j][None, :], exth.sub(hi, lo)))
        return cur[0]

    zero = np.zeros(4, np.uint64)
    one = exth.one()
    pt_even = np.concatenate([zero[None], rt], axis=0)
    pt_odd = np.concatenate([one[None], rt], axis=0)
    pt_hi = np.concatenate([rt, one[None]], axis=0)
    for c in range(7):
        np.testing.assert_array_equal(evals[7 + c], mle_eval(x[c], pt_even))   # x0
        np.testing.assert_array_equal(evals[21 + c], mle_eval(x[c], pt_odd))   # x1
        np.testing.assert_array_equal(evals[35 + c], mle_eval(x[c], pt_hi))    # x3
        np.testing.assert_array_equal(evals[c], mle_eval(s[c], pt_hi))         # s
        np.testing.assert_array_equal(evals[14 + c], mle_eval(y[c], pt_even))  # y0


def test_quark_rejects_wrong_sum():
    n_pts, n_rows = 6, 16
    xs, ys = _random_points(n_pts)
    x, y, s, final = Q.build_tree_witness(xs, ys, n_rows)
    tp = Transcript(b"ecc-test")
    proof, _rt = Q.prove_ec_sum(x, y, s, n_pts, final, tp)
    bad = final.copy()
    bad[0, 0] = (int(bad[0, 0]) + 1) % bb.P
    with pytest.raises(Q.EccError):
        Q.verify_ec_sum(proof, bad, Transcript(b"ecc-test"))
    # claimed sum consistent but proof exported a different point
    tp2 = Transcript(b"ecc-test")
    proof2, _ = Q.prove_ec_sum(x, y, s, n_pts, bad, tp2)
    from ceno_tpu.sumcheck.verifier import SumcheckError

    with pytest.raises((Q.EccError, SumcheckError)):
        Q.verify_ec_sum(proof2, bad, Transcript(b"ecc-test"))


def test_quark_rejects_tampered_tree():
    n_pts, n_rows = 6, 16
    xs, ys = _random_points(n_pts)
    x, y, s, final = Q.build_tree_witness(xs, ys, n_rows)
    x[0, n_rows - 2] = (int(x[0, n_rows - 2]) + 1) % bb.P  # corrupt a tree node
    tp = Transcript(b"ecc-test")
    proof, _rt = Q.prove_ec_sum(x, y, s, n_pts, final, tp)
    with pytest.raises((Q.EccError, Exception)):
        Q.verify_ec_sum(proof, final, Transcript(b"ecc-test"))
