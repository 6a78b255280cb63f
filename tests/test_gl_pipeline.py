"""Goldilocks proving pipeline (host reference kernels): L1 sumcheck +
transcript, L2 Basefold PCS over GoldilocksExt2 (reference `--field
goldilocks`, ff_ext::GoldilocksExt2 — e2e.rs:103-129)."""

import numpy as np
import pytest

from ceno_tpu.fields import gl_host as gl
from ceno_tpu.fields import gl2_host as g2
from ceno_tpu.gl import pcs, sumcheck as sc
from ceno_tpu.gl.transcript import GlTranscript

rng = np.random.default_rng(7)
P = gl.P


def _rand_base(shape):
    lo = rng.integers(0, 1 << 32, size=shape, dtype=np.uint64)
    hi = rng.integers(0, 1 << 32, size=shape, dtype=np.uint64)
    return (lo | (hi << np.uint64(32))) % np.uint64(P)


def _rand_ext(shape):
    return np.stack([_rand_base(shape), _rand_base(shape)], axis=-1)


def test_gl_field_conformance():
    import random

    random.seed(11)
    for _ in range(200):
        a = random.randrange(P)
        b = random.randrange(P)
        assert int(gl.mul(np.uint64(a), np.uint64(b))) == a * b % P
        assert int(gl.add(np.uint64(a), np.uint64(b))) == (a + b) % P
        assert int(gl.sub(np.uint64(a), np.uint64(b))) == (a - b) % P
    a = _rand_base(32)
    assert np.array_equal(gl.mul(a, gl.inv(a)), np.ones(32, np.uint64))
    w = gl.two_adic_root(12)
    assert pow(w, 1 << 12, P) == 1 and pow(w, 1 << 11, P) != 1


def test_gl_poseidon2_permutes_and_batches():
    from ceno_tpu.gl import poseidon2 as p2

    st = _rand_base(8)
    out1 = p2.permute_host(st)
    assert not np.array_equal(out1, st)
    # batched == per-lane
    lanes = np.stack([st, _rand_base(8)], axis=1)  # (8, 2)
    outb = p2.permute_host(lanes)
    assert np.array_equal(outb[:, 0], p2.permute_host(lanes[:, 0]))
    assert np.array_equal(outb[:, 1], p2.permute_host(lanes[:, 1]))


def test_gl_sumcheck_roundtrip():
    n_vars, n = 6, 64
    f = _rand_base(n)
    g = _rand_ext(n)
    scalar = _rand_ext(())
    acc = np.zeros(2, np.uint64)
    for i in range(n):
        acc = g2.add(acc, g2.mul(g2.from_base(f[i]), g[i]))
    claim = g2.mul(scalar, acc)
    tp = GlTranscript(b"gl-sc")
    out = sc.prove([f], [g], [(scalar, (0,), (0,))], n_vars, tp)
    tv = GlTranscript(b"gl-sc")
    point, final = sc.verify(claim, out.round_msgs, n_vars, tv, deg=2)
    assert np.array_equal(point, out.point)
    expect = g2.mul(scalar, g2.mul(out.final_base[0], out.final_ext[0]))
    assert np.array_equal(final, expect)


def test_gl_sumcheck_rejects_tamper():
    n_vars, n = 4, 16
    f = _rand_base(n)
    claim = np.array([int(f.astype(object).sum()) % P, 0], np.uint64)
    tp = GlTranscript(b"gl-sc2")
    out = sc.prove([f], [], [(g2.one(), (0,), ())], n_vars, tp)
    bad = out.round_msgs.copy()
    bad[1, 0, 0] = (int(bad[1, 0, 0]) + 1) % P
    with pytest.raises(sc.GlSumcheckError):
        sc.verify(claim, bad, n_vars, GlTranscript(b"gl-sc2"), deg=1)


def _pcs_roundtrip(n_vars=7, n_cols=3, params=None, tamper=None):
    params = params or pcs.GlParams(blowup_log=1, n_queries=6, pow_bits=4,
                                    stop_size=16)
    n = 1 << n_vars
    cols = _rand_base((n_cols, n))
    committed = pcs.commit(cols, params)
    z = _rand_ext(n_vars)
    # values: fold-eval each column at z (round order: z[0] = top bit)
    values = []
    for j in range(n_cols):
        cur = g2.from_base(cols[j])
        for t in range(n_vars):
            cur = sc._fold_top(cur, z[t])
        values.append(cur[0])
    values = np.stack(values)
    tp = GlTranscript(b"gl-pcs")
    tp.append(committed.root)
    proof = pcs.open_batch(committed, z, values, tp, params)
    if tamper:
        tamper(proof, values)
    tv = GlTranscript(b"gl-pcs")
    tv.append(committed.root)
    pcs.verify_batch(committed.root, n_vars, n_cols, z, values, proof, tv,
                     params)


def test_gl_pcs_roundtrip():
    _pcs_roundtrip()


def test_gl_pcs_multi_level():
    _pcs_roundtrip(n_vars=9, n_cols=5,
                   params=pcs.GlParams(blowup_log=2, n_queries=8, pow_bits=4,
                                       stop_size=32))


def test_gl_pcs_rejects_wrong_value():
    with pytest.raises(pcs.GlPCSError):
        def t(proof, values):
            values[0] = g2.add(values[0], g2.one())
        _pcs_roundtrip(tamper=t)


def test_gl_pcs_rejects_tampered_query():
    with pytest.raises(pcs.GlPCSError):
        def t(proof, values):
            q = proof.queries[0]
            q.base_col_vals[0, 0] = (int(q.base_col_vals[0, 0]) + 1) % P
        _pcs_roundtrip(tamper=t)


def test_gl_pcs_rejects_bad_pow():
    with pytest.raises(pcs.GlPCSError):
        def t(proof, values):
            proof.pow_nonce = (proof.pow_nonce + 1) % P
        _pcs_roundtrip(tamper=t)


def test_gl_pcs_rejects_tampered_tail():
    with pytest.raises(pcs.GlPCSError):
        def t(proof, values):
            proof.tail[0, 0] = (int(proof.tail[0, 0]) + 1) % P
        _pcs_roundtrip(tamper=t)


def test_gl_zkvm_chip_proves_real_add_circuit():
    """The REAL rv32im ADD chip (same compiled circuit the BabyBear zkVM
    proves) proves and verifies over GoldilocksExt2 — the `--field
    goldilocks` capability on actual circuits (gl/zkvm.py)."""
    from ceno_tpu.emulator import programs, native
    from ceno_tpu.gl import zkvm as gz
    from ceno_tpu.gl.pcs import GlParams
    from ceno_tpu.zkvm.chips import build_all_chips
    from ceno_tpu.zkvm.chips.opcodes import TraceView
    from ceno_tpu.zkvm.e2e import public_values_from_vm
    from ceno_tpu.zkvm.tables import ZKVMConfig
    from ceno_tpu.zkvm.witgen import assign_opcode_chips

    vm = programs.fibonacci_vm(40)
    trace = native.run_trace(vm)
    view = TraceView.from_records(trace) if not isinstance(trace, TraceView) \
        else trace
    chips = build_all_chips()
    assigned = assign_opcode_chips(view, chips)
    add = next(a for a in assigned if a.name == "add" and a.num_instances)
    pv = public_values_from_vm(vm, ZKVMConfig(shl_x_bits=6, mem_words_log=7))
    params = GlParams(blowup_log=1, n_queries=4, pow_bits=4, stop_size=16)
    # field-specific witness columns: the is-zero gadget's inverse witness
    # must be the GL inverse (witgen targets BabyBear; --field goldilocks
    # witgen recomputes these, gl/zkvm.py docstring)
    wit = np.asarray(add.wit, np.uint64).copy()
    wn = add.cb.wit_names
    wit[wn.index("rd_idinv")] = gl.inv(wit[wn.index("rd_id")])
    proof = gz.prove_chip_gl(add.compiled, wit, pv, add.num_instances,
                             params)
    prod_values, logup_fracs = gz.verify_chip_gl(add.compiled, proof, pv,
                                                 params)
    # cross-check a tower total against direct GL evaluation of the records
    from ceno_tpu.fields import gl2_host as g2
    prods, logups = gz.build_records_gl(
        add.compiled, wit,
        np.zeros((0, wit.shape[1]), np.uint64),
        np.zeros((0, wit.shape[1]), np.uint64), pv,
        _replay_challenges(proof), add.num_instances,
    )
    direct = g2.one()
    for row in prods[0]:
        direct = g2.mul(direct, row)
    assert np.array_equal(prod_values[0], direct)

    # tamper a LOCALLY-constrained cell (the is-zero flag: breaks the
    # rd_z_def zero constraint; pure record fields are only bound by the
    # cross-chip bus, which a single-chip demo cannot check)
    bad_wit = wit.copy()
    zc = wn.index("rd_iszero")
    bad_wit[zc, 1] = (int(bad_wit[zc, 1]) + 1) % (2**64 - 2**32 + 1)
    bad = gz.prove_chip_gl(add.compiled, bad_wit, pv, add.num_instances,
                           params)
    from ceno_tpu.gl.sumcheck import GlSumcheckError
    from ceno_tpu.gl.pcs import GlPCSError
    with pytest.raises((gz.GlZkvmError, GlSumcheckError, GlPCSError)):
        gz.verify_chip_gl(add.compiled, bad, pv, params)


def _replay_challenges(proof):
    from ceno_tpu.fields import gl_host as gl
    from ceno_tpu.gl.transcript import GlTranscript

    t = GlTranscript(b"ceno-gl/chip/v1")
    t.append(np.asarray(proof.root, np.uint64))
    t.append([proof.num_instances % gl.P])
    return np.stack([t.sample_ext(), t.sample_ext()])
