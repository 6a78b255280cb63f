"""Chip-level prove/verify roundtrip with a toy circuit pair.

Chip A ("adder"): witness a, b, c with constraint a + b - c = 0, writes record
(c, ts) and looks up c in an 8-bit range table. Chip B ("range table"):
lk_table over a structural incremental column with committed multiplicities,
and reads record (c, ts) — so the global read/write multiset and logup sum
balance exactly like the zkVM's bus.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from ceno_tpu.fields import babybear as bb
from ceno_tpu.fields import ext4_host as exth
from ceno_tpu.hash import Transcript
from ceno_tpu.gkr import CircuitBuilder, compile_chip, prove_chip, verify_chip
from ceno_tpu.gkr.circuit_builder import StructuralSpec, LK_RANGE8
from ceno_tpu.gkr.chip import sel_eq_eval, sel_prefix_sum, ChipError
from ceno_tpu.gkr.mock import MockProver

rng = np.random.default_rng(41)


def _build_adder():
    cb = CircuitBuilder("adder")
    a = cb.create_witin("a")
    b = cb.create_witin("b")
    c = cb.create_witin("c")
    ts = cb.create_structural(StructuralSpec("incremental", start=1, step=1))
    cb.require_zero("sum", a + b - c)
    cb.write_record([c, ts])
    cb.lk_record(LK_RANGE8, [c])
    return cb


def _build_consumer():
    cb = CircuitBuilder("consumer")
    cval = cb.create_witin("cval")
    cts = cb.create_witin("cts")
    cb.read_record([cval, cts])
    return cb


def _build_table():
    cb = CircuitBuilder("range8")
    mult = cb.create_witin("mult")
    val = cb.create_structural(StructuralSpec("incremental", start=0, step=1))
    cb.lk_table_record(LK_RANGE8, mult, [val])
    return cb


def _assign(n_rows_a=8, table_rows=256):
    a = rng.integers(0, 100, size=n_rows_a, dtype=np.uint64)
    b = rng.integers(0, 100, size=n_rows_a, dtype=np.uint64)
    c = a + b
    wit_a = np.stack([a, b, c])
    mult = np.zeros(table_rows, np.uint64)
    for v in c:
        mult[int(v)] += 1
    wit_t = mult[None, :]
    cval = c.copy()
    cts = 1 + np.arange(n_rows_a, dtype=np.uint64)
    wit_c = np.stack([cval, cts])
    return wit_a, wit_c, wit_t, n_rows_a


def test_mock_prover_pass_and_fail():
    cb_a, cb_c, cb_t = _build_adder(), _build_consumer(), _build_table()
    ca, cc, ct = compile_chip(cb_a), compile_chip(cb_c), compile_chip(cb_t)
    wit_a, wit_c, wit_t, k = _assign()
    chips = [
        (ca, cb_a, wit_a, np.zeros((0, 8), np.uint64), np.zeros(0), k),
        (cc, cb_c, wit_c, np.zeros((0, 8), np.uint64), np.zeros(0), k),
        (ct, cb_t, wit_t, np.zeros((0, 256), np.uint64), np.zeros(0), 256),
    ]
    assert MockProver.assert_satisfied(chips) == []
    # break a constraint
    bad = wit_a.copy()
    bad[2, 3] += 1
    chips_bad = [
        (ca, cb_a, bad, np.zeros((0, 8), np.uint64), np.zeros(0), k),
        (cc, cb_c, wit_c, np.zeros((0, 8), np.uint64), np.zeros(0), k),
        (ct, cb_t, wit_t, np.zeros((0, 256), np.uint64), np.zeros(0), 256),
    ]
    errs = MockProver.assert_satisfied(chips_bad, raise_on_error=False)
    assert any(e.constraint == "sum" and e.row == 3 for e in errs)


def test_sel_eq_eval_matches_bruteforce():
    n_vars, k = 4, 11
    rt = rng.integers(0, bb.P, size=(n_vars, 4), dtype=np.uint64)
    pt = rng.integers(0, bb.P, size=(n_vars, 4), dtype=np.uint64)
    acc = np.zeros(4, np.uint64)
    for x in range(k):
        xb = [(x >> j) & 1 for j in range(n_vars)]
        e1, e2 = exth.one(), exth.one()
        for j, bit in enumerate(xb):
            f1 = rt[j] if bit else exth.sub(exth.from_base(1), rt[j])
            f2 = pt[j] if bit else exth.sub(exth.from_base(1), pt[j])
            e1, e2 = exth.mul(e1, f1), exth.mul(e2, f2)
        acc = exth.add(acc, exth.mul(e1, e2))
    np.testing.assert_array_equal(sel_eq_eval(rt, pt, k), acc)
    # prefix-sum special case: point = rt replaced by all-ones eq? use direct
    acc2 = np.zeros(4, np.uint64)
    for x in range(k):
        xb = [(x >> j) & 1 for j in range(n_vars)]
        e1 = exth.one()
        for j, bit in enumerate(xb):
            f1 = rt[j] if bit else exth.sub(exth.from_base(1), rt[j])
            e1 = exth.mul(e1, f1)
        acc2 = exth.add(acc2, e1)
    np.testing.assert_array_equal(sel_prefix_sum(rt, k), acc2)


def _prove_both():
    cb_a, cb_c, cb_t = _build_adder(), _build_consumer(), _build_table()
    ca, cc, ct = compile_chip(cb_a), compile_chip(cb_c), compile_chip(cb_t)
    wit_a, wit_c, wit_t, k = _assign()
    challenges = rng.integers(1, bb.P, size=(2, 4), dtype=np.uint64)
    from ceno_tpu.gkr.chip import structural_table

    def dev(x):
        return jnp.asarray(bb.np_to_monty(np.asarray(x, np.uint64).astype(np.uint32)))

    tp = Transcript(b"chip-test")
    proofs = []
    for compiled, wit, kk, n in ((ca, wit_a, k, 8), (cc, wit_c, k, 8), (ct, wit_t, 256, 256)):
        structural = np.stack(
            [structural_table(s, n) for s in compiled.structural]
        ) if compiled.structural else np.zeros((0, n), np.uint64)
        proof, opening = prove_chip(
            compiled, dev(wit), dev(np.zeros((0, n), np.uint64)), dev(structural),
            np.zeros(0), kk, challenges, tp,
        )
        proofs.append((compiled, proof, opening, wit, structural))
    return proofs, challenges, (ca, cc, ct)


@pytest.mark.slow
def test_chip_prove_verify_roundtrip():
    proofs, challenges, _ = _prove_both()
    tv = Transcript(b"chip-test")
    prod_r = exth.one()
    prod_w = exth.one()
    logup_num = np.zeros(4, np.uint64)
    logup_den = exth.one()
    for compiled, proof, opening, wit, structural in proofs:
        vop, prod_values, logup_fracs = verify_chip(
            compiled, proof, np.zeros(0), challenges, tv
        )
        np.testing.assert_array_equal(vop.point, opening.point)
        np.testing.assert_array_equal(vop.wit_evals, opening.wit_evals)
        pi = 0
        if compiled.r_exprs:
            prod_r = exth.mul(prod_r, prod_values[pi])
            pi += 1
        if compiled.w_exprs:
            prod_w = exth.mul(prod_w, prod_values[pi])
            pi += 1
        for s in range(logup_fracs.shape[0]):
            p, q = logup_fracs[s]
            logup_num = exth.add(exth.mul(logup_num, q), exth.mul(p, logup_den))
            logup_den = exth.mul(logup_den, q)
    # global bus balance: products equal, logup fraction sum zero
    np.testing.assert_array_equal(prod_r, prod_w)
    np.testing.assert_array_equal(logup_num, np.zeros(4, np.uint64))
    # witness evals match direct MLE evaluation at the opening point
    compiled, proof, opening, wit, structural = proofs[0]
    col = wit[0]
    cur = exth.from_base(np.pad(col, (0, 8 - len(col))) if len(col) < 8 else col)
    point = opening.point
    for j in range(point.shape[0] - 1, -1, -1):
        half = cur.shape[0] // 2
        cur = exth.add(cur[:half], exth.mul(point[j][None, :], exth.sub(cur[half:], cur[:half])))
    np.testing.assert_array_equal(opening.wit_evals[0], cur[0])


def test_chip_tampered_witness_rejected():
    cb_a = _build_adder()
    ca = compile_chip(cb_a)
    wit_a, _, _, k = _assign()
    wit_a[2, 1] += 1  # break a+b=c on row 1
    challenges = rng.integers(1, bb.P, size=(2, 4), dtype=np.uint64)
    from ceno_tpu.gkr.chip import structural_table

    def dev(x):
        return jnp.asarray(bb.np_to_monty(np.asarray(x, np.uint64).astype(np.uint32)))

    structural = np.stack([structural_table(s, 8) for s in ca.structural])
    tp = Transcript(b"chip-bad")
    proof, _ = prove_chip(
        ca, dev(wit_a), dev(np.zeros((0, 8), np.uint64)), dev(structural),
        np.zeros(0), k, challenges, tp,
    )
    tv = Transcript(b"chip-bad")
    try:
        verify_chip(ca, proof, np.zeros(0), challenges, tv)
        assert False, "broken constraint must fail"
    except (ChipError, Exception):
        pass


def test_structural_variants_table_matches_eval():
    """Every StructuralWitInType variant: the materialized table's MLE
    evaluated at a random point equals the analytic structural_eval."""
    from ceno_tpu.fields import ext4_host as exth
    from ceno_tpu.gkr.chip import structural_eval, structural_table
    from ceno_tpu.gkr.circuit_builder import StructuralSpec
    from ceno_tpu.sumcheck import host_impl as H

    n_vars, n = 5, 32
    instances = np.array([0, 12345, 7], np.uint64)
    specs = [
        StructuralSpec("incremental", start=100, step=3),
        StructuralSpec("incremental", start=900, step=7, descending=True),
        StructuralSpec("incremental_dynamic", start=1, step=4),
        StructuralSpec("stacked_incremental"),
        StructuralSpec("stacked_constant"),
        StructuralSpec("inner_repeat", k=2),
        StructuralSpec("outer_repeat", k=3),
        StructuralSpec("empty"),
    ]
    point = rng.integers(0, bb.P, size=(n_vars, 4)).astype(np.uint64)
    eq = H.build_eq_host(point)
    for spec in specs:
        table = structural_table(spec, n, instances)
        assert table.shape == (n,)
        acc = np.zeros(4, np.uint64)
        for i in range(n):
            acc = exth.add(acc, exth.mul_base(eq[i], np.uint64(table[i])))
        expect = structural_eval(spec, point, instances)
        assert np.array_equal(acc, expect), spec


def test_structural_variant_tables_exact():
    """Spot-check the variant tables against their defining sequences."""
    from ceno_tpu.gkr.chip import structural_table
    from ceno_tpu.gkr.circuit_builder import StructuralSpec

    t = structural_table(StructuralSpec("stacked_incremental"), 8)
    assert t.tolist() == [0, 0, 0, 1, 0, 1, 2, 3]
    t = structural_table(StructuralSpec("stacked_constant"), 8)
    assert t.tolist() == [0, 0, 1, 1, 2, 2, 2, 2]
    t = structural_table(StructuralSpec("inner_repeat", k=1), 8)
    assert t.tolist() == [0, 0, 1, 1, 2, 2, 3, 3]
    t = structural_table(StructuralSpec("outer_repeat", k=2), 8)
    assert t.tolist() == [0, 1, 2, 3, 0, 1, 2, 3]
    t = structural_table(
        StructuralSpec("incremental", start=10, step=2, descending=True), 4
    )
    assert t.tolist() == [10, 8, 6, 4]
