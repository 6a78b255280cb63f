"""Tower product/logup prove+verify roundtrips vs brute force."""

import numpy as np
import pytest
import jax.numpy as jnp

from ceno_tpu.fields import babybear as bb
from ceno_tpu.fields import ext4_host as exth
from ceno_tpu.hash import Transcript
from ceno_tpu.gkr import tower

rng = np.random.default_rng(21)


def _rand_ext(n_vars):
    return rng.integers(0, bb.P, size=(4, 1 << n_vars), dtype=np.uint32)


def _dev(x):
    return jnp.asarray(bb.np_to_monty(x))


def _host_eval(vals_4N, point):
    cur = np.asarray(vals_4N, np.uint64).T  # (N, 4)
    n = point.shape[0]
    for j in range(n - 1, -1, -1):
        half = cur.shape[0] // 2
        lo, hi = cur[:half], cur[half:]
        cur = exth.add(lo, exth.mul(point[j][None, :], exth.sub(hi, lo)))
    return cur[0]


def _brute_product(v):
    acc = exth.one()
    for i in range(v.shape[1]):
        acc = exth.mul(acc, v[:, i].astype(np.uint64))
    return acc


def _brute_fraction(p, q):
    """Sum p_i/q_i as a fraction (num, den)."""
    num = np.zeros(4, np.uint64)
    den = exth.one()
    for i in range(p.shape[1]):
        num = exth.add(
            exth.mul(num, q[:, i].astype(np.uint64)),
            exth.mul(p[:, i].astype(np.uint64), den),
        )
        den = exth.mul(den, q[:, i].astype(np.uint64))
    return num, den


def test_product_tower_roundtrip():
    n_vars = 5
    v1, v2 = _rand_ext(n_vars), _rand_ext(n_vars)
    tp = Transcript(b"tower")
    proof, point, (prod_claims, _) = tower.prove_towers(
        [_dev(v1), _dev(v2)], [], tp
    )
    tv = Transcript(b"tower")
    vpoint, vp_claims, _, prod_values, _ = tower.verify_towers(proof, n_vars, tv)
    np.testing.assert_array_equal(vpoint, point)
    np.testing.assert_array_equal(vp_claims, prod_claims)
    # totals match brute force
    np.testing.assert_array_equal(prod_values[0], _brute_product(v1))
    np.testing.assert_array_equal(prod_values[1], _brute_product(v2))
    # record claims really are evaluations of the input MLEs at the point
    np.testing.assert_array_equal(prod_claims[0], _host_eval(v1, point))
    np.testing.assert_array_equal(prod_claims[1], _host_eval(v2, point))


def test_logup_tower_roundtrip():
    n_vars = 4
    p, q = _rand_ext(n_vars), _rand_ext(n_vars)
    tp = Transcript(b"logup")
    proof, point, (_, logup_claims) = tower.prove_towers([], [(_dev(p), _dev(q))], tp)
    tv = Transcript(b"logup")
    vpoint, _, vl_claims, _, logup_fracs = tower.verify_towers(proof, n_vars, tv)
    np.testing.assert_array_equal(vpoint, point)
    np.testing.assert_array_equal(vl_claims, logup_claims)
    num, den = _brute_fraction(p, q)
    # claimed fraction equals brute force (cross-multiplied)
    np.testing.assert_array_equal(
        exth.mul(logup_fracs[0][0], den), exth.mul(num, logup_fracs[0][1])
    )
    np.testing.assert_array_equal(logup_claims[0][0], _host_eval(p, point))
    np.testing.assert_array_equal(logup_claims[0][1], _host_eval(q, point))


def test_mixed_towers():
    n_vars = 3
    v = _rand_ext(n_vars)
    p, q = _rand_ext(n_vars), _rand_ext(n_vars)
    tp = Transcript(b"mixed")
    proof, point, (pc, lc) = tower.prove_towers([_dev(v)], [(_dev(p), _dev(q))], tp)
    tv = Transcript(b"mixed")
    vpoint, vpc, vlc, pv, lf = tower.verify_towers(proof, n_vars, tv)
    np.testing.assert_array_equal(vpc, pc)
    np.testing.assert_array_equal(vlc, lc)
    np.testing.assert_array_equal(pv[0], _brute_product(v))


def test_tampered_tower_rejected():
    n_vars = 4
    v = _rand_ext(n_vars)
    tp = Transcript(b"tamper")
    proof, _, _ = tower.prove_towers([_dev(v)], [], tp)
    proof.level_evals[1][0][0] = (proof.level_evals[1][0][0] + 1) % bb.P
    tv = Transcript(b"tamper")
    try:
        tower.verify_towers(proof, n_vars, tv)
        assert False, "should reject"
    except (tower.TowerError, Exception):
        pass


@pytest.mark.slow
def test_fused_tower_levels_byte_identical(monkeypatch):
    """The single-program multi-level tower (CENO_TPU_FUSED_TOWER) must be
    byte-identical to the per-level path."""
    import importlib

    import jax.numpy as jnp

    from ceno_tpu.fields import babybear as bb
    from ceno_tpu.gkr import tower
    from ceno_tpu.hash.transcript import Transcript

    rng2 = np.random.default_rng(17)
    n = 1 << 9
    recs = [jnp.asarray(rng2.integers(0, bb.P, size=(4, n), dtype=np.uint32))
            for _ in range(4)]
    # 2 prods + 1 logup = 5 terms -> compile_terms pads to 8 (exercises the
    # zero-scalar sentinel slot in the fused kernel's alpha table)
    lps = [(recs[2], recs[3])]

    def run(fused):
        monkeypatch.setenv("CENO_TPU_FUSED_TOWER", "1" if fused else "0")
        # _TOWER_HOST_N is import-time; force device levels by monkeypatching
        monkeypatch.setattr(tower, "_TOWER_HOST_N", 64)
        t = Transcript(b"fused-tower-test")
        proof, rt, (pc, lc) = tower.prove_towers(recs[:2], lps, t)
        return proof, rt, pc, lc, t.state.copy()

    p1, rt1, pc1, lc1, st1 = run(True)
    p0, rt0, pc0, lc0, st0 = run(False)
    assert np.array_equal(rt1, rt0)
    assert np.array_equal(st1, st0)
    assert np.array_equal(p1.prod_out, p0.prod_out)
    assert len(p1.round_msgs) == len(p0.round_msgs)
    for a, b in zip(p1.round_msgs, p0.round_msgs):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(p1.level_evals, p0.level_evals):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    # and it verifies
    tv = Transcript(b"fused-tower-test")
    tower.verify_towers(p1, 9, tv)
