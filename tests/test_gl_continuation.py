"""GL continuations: quintic hash-to-curve, shard chips, quark, 2-shard e2e.

Strategy mirror of the BabyBear shard tests (tests/test_zkvm_shard.py
pattern) for the GL configuration: fast paths exercise the new machinery
in isolation — hash-to-curve orientation, the in-circuit constraint set
against witgen (a GL MockProver equivalent via eval_expr_gl), the quark
prove/verify roundtrip — and the slow path proves a 2-shard fibonacci
over GL and verifies the stitched chain (gl/shard.py)."""

import numpy as np
import pytest

from ceno_tpu.fields import gl_host as gl
from ceno_tpu.fields import gl2_host as g2
from ceno_tpu.fields import gl5_host as G5
from ceno_tpu.gl import eccquark as glq
from ceno_tpu.gl import shard_chips as sc
from ceno_tpu.gl.transcript import GlTranscript
from ceno_tpu.zkvm.chips.shard_ram import Tokens

rng = np.random.default_rng(11)


def _mk_tokens(n, shard=1):
    return Tokens(
        is_reg=rng.integers(0, 2, n).astype(np.uint64),
        addr=rng.integers(0, 1 << 20, n).astype(np.uint64),
        value=rng.integers(0, 1 << 32, n).astype(np.uint64),
        shard=np.full(n, shard, np.uint64),
        clk=rng.integers(1, 1 << 24, n).astype(np.uint64),
    )


def test_tokens_to_points_gl_on_curve_and_oriented():
    tok = _mk_tokens(17)
    nonce, xs, ys = sc.tokens_to_points_gl(tok)
    assert G5.is_on_curve(xs, ys).all()
    y4 = ys[:, 4]
    assert (y4 >= 1).all() and (y4 <= np.uint64(sc.HALF)).all()
    # determinism
    _, xs2, ys2 = sc.tokens_to_points_gl(tok)
    assert np.array_equal(xs, xs2) and np.array_equal(ys, ys2)


def _gl_mock_check(chip, wit, k, pv):
    """Every require_zero of a GL chip vanishes on the active rows —
    the GL equivalent of the MockProver pattern (CLAUDE.md)."""
    from ceno_tpu.gl.zkvm import eval_expr_gl

    n = wit.shape[1]
    fixed = np.zeros((0, n), np.uint64)
    structural = np.zeros((0, n), np.uint64)
    challenges = np.stack([g2.from_base(7), g2.from_base(13)])
    memo = {}
    for name, expr in chip.cb.zeros:
        kind, v = eval_expr_gl(expr, wit, fixed, structural, pv, challenges,
                               memo)
        v = np.broadcast_to(np.atleast_1d(np.asarray(v, np.uint64)), (n,)) \
            if kind == "b" else v
        active = v[:k] if kind == "b" else v[:k]
        assert not np.asarray(active, np.uint64).any(), (
            f"{chip.name}.{name} violated"
        )


@pytest.mark.parametrize("direction", ["in", "out"])
def test_shard_ram_chip_gl_constraints(direction):
    chip = sc.build_gl_shard_chips()[0 if direction == "in" else 1]
    tok = _mk_tokens(5, shard=3)
    wit = sc.assign_shard_ram_gl(chip, tok)
    pv = np.zeros(69, np.uint64)
    from ceno_tpu.zkvm.layout import PV_SHARD_ID, N_PUBLIC_VALUES

    pv = np.zeros(N_PUBLIC_VALUES, np.uint64)
    pv[PV_SHARD_ID] = 3
    _gl_mock_check(chip, wit, tok.n, pv)
    # tampered y limb must violate the curve constraint
    bad = wit.copy()
    yi = chip.cb.wit_names.index("y0")
    bad[yi, 0] = (int(bad[yi, 0]) + 1) % gl.P
    with pytest.raises(AssertionError):
        _gl_mock_check(chip, bad, tok.n, pv)


def test_gl_quark_roundtrip():
    n_pts = 11
    xs = np.zeros((n_pts, 5), np.uint64)
    ys = np.zeros((n_pts, 5), np.uint64)
    got = 0
    seed = 0
    while got < n_pts:
        cand = rng.integers(0, 1 << 62, (8, 5)).astype(np.uint64)
        y, ok = G5.from_x(cand)
        for i in np.nonzero(ok)[0]:
            if got < n_pts:
                xs[got], ys[got] = cand[i], y[i]
                got += 1
        seed += 1
    half = 16
    x, y, s, final = glq.build_tree_witness(xs, ys, 2 * half)
    # tree sum == affine fold
    acc = (np.zeros(5, np.uint64), np.zeros(5, np.uint64))
    for i in range(n_pts):
        acc = G5.point_add(acc, (xs[i], ys[i]))
    assert np.array_equal(final[0], acc[0])
    assert np.array_equal(final[1], acc[1])

    t = GlTranscript(b"test-gl-quark")
    proof, rt = glq.prove_ec_sum(x, y, s, n_pts, final, t)
    tv = GlTranscript(b"test-gl-quark")
    rt_v, evals = glq.verify_ec_sum(proof, final, tv)
    assert np.array_equal(rt, rt_v)
    # extended-point evals match direct MLEs of the witness columns
    from ceno_tpu.gl.sumcheck import build_eq

    cols = np.concatenate([x, y, s], axis=0)  # (15, 2N)
    pts = glq.extended_points(rt_v)
    for pname, claims in glq.EC_POINTS:
        eq = build_eq(pts[pname])
        for ev_off, col_base in claims:
            for c in range(5):
                col = cols[col_base + c]
                direct = np.array(
                    [int((eq[:, j].astype(object)
                          * col.astype(object)).sum()) % gl.P
                     for j in range(2)], np.uint64)
                assert np.array_equal(direct, evals[ev_off + c]), (
                    pname, ev_off, c)

    # tamper: wrong public sum rejected
    bad = np.array(final, np.uint64)
    bad[0, 0] = (int(bad[0, 0]) + 1) % gl.P
    with pytest.raises(glq.GlEccError):
        glq.verify_ec_sum(proof, bad, GlTranscript(b"test-gl-quark"))


@pytest.mark.slow
def test_gl_two_shard_fibonacci():
    from ceno_tpu.emulator import programs
    from ceno_tpu.gl.shard import (
        prove_shards_gl, verify_shards_gl, GlShardChainError,
    )
    from ceno_tpu.gl import scheme as gls
    from ceno_tpu.zkvm.scheme import keygen
    from ceno_tpu.zkvm.tables import ZKVMConfig
    from ceno_tpu.zkvm.layout import PV_RW_SUM_IN

    from ceno_tpu.gl.pcs import GlParams

    cfg = ZKVMConfig(shl_x_bits=6, mem_words_log=7)
    # small PCS params (the BB torture-test pattern): this is a correctness
    # test of the continuation machinery, not a security-level benchmark —
    # full params spend ~10 min/shard in host Merkle/query work alone
    params = GlParams(blowup_log=1, n_queries=4, pow_bits=0, stop_size=32)
    vm = programs.fibonacci_vm(8)
    records = vm.run()
    pk = keygen(vm.program, cfg)
    n = len(records)
    sp = prove_shards_gl(pk, vm, records, max_steps_per_shard=n // 2 + 4,
                         params=params)
    assert sp.n_shards >= 2, "trace did not split"
    assert any(
        np.asarray(p.public_values, np.uint64)[
            PV_RW_SUM_IN : PV_RW_SUM_IN + 5].any()
        for p in sp.proofs
    ), "no cross-shard tokens hashed"
    vk = gls.keygen_gl(pk)
    assert verify_shards_gl(vk, sp, params=params)

    # tamper: one rw-sum limb -> the EC identity (or the shard proof) fails
    import dataclasses

    victim = next(
        i for i, p in enumerate(sp.proofs)
        if np.asarray(p.public_values, np.uint64)[
            PV_RW_SUM_IN : PV_RW_SUM_IN + 5].any()
    )
    bad_pv = np.array(sp.proofs[victim].public_values, np.uint64)
    bad_pv[PV_RW_SUM_IN] = (int(bad_pv[PV_RW_SUM_IN]) + 1) % gl.P
    bad_proofs = list(sp.proofs)
    bad_proofs[victim] = dataclasses.replace(
        sp.proofs[victim], public_values=bad_pv)
    with pytest.raises(Exception):
        verify_shards_gl(vk, dataclasses.replace(sp, proofs=bad_proofs),
                         params=params)
