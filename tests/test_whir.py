"""WHIR PCS: multi-iteration roundtrip and tamper rejection (host path)."""

import numpy as np
import pytest

from ceno_tpu.fields import babybear as bb
from ceno_tpu.fields import ext4_host as exth
from ceno_tpu.hash.transcript import Transcript
from ceno_tpu.pcs import basefold, whir
from ceno_tpu.pcs.basefold import BasefoldParams
from ceno_tpu.sumcheck import host_impl as H

RNG = np.random.default_rng(11)
N_VARS, C, BLOWUP = 12, 5, 2
WP = whir.WhirParams(k=3, stop_vars=5, security_bits=8)


def _mle_eval(col, z):
    eq = H.build_eq_host(np.asarray(z, np.uint64))
    acc = np.zeros(4, np.uint64)
    for i in range(len(col)):
        acc = exth.add(acc, exth.mul_base(eq[i], np.uint64(col[i])))
    return acc


def _setup():
    cols = RNG.integers(0, bb.P, size=(C, 1 << N_VARS)).astype(np.uint64)
    committed = basefold.commit(cols, BasefoldParams(blowup_log=BLOWUP))
    z = RNG.integers(0, bb.P, size=(N_VARS, 4)).astype(np.uint64)
    values = np.stack([_mle_eval(cols[j], z) for j in range(C)])
    return committed, z, values


def test_whir_roundtrip_multiple_iterations():
    committed, z, values = _setup()
    tp = Transcript(b"whir-test")
    proof = whir.open_whir(committed, z, values, tp, BLOWUP, WP)
    assert len(proof.iters) == 2  # 12 -> 9 -> 6 -> final 3
    tv = Transcript(b"whir-test")
    whir.verify_whir(committed.root, N_VARS, C, z, values, proof, tv,
                     BLOWUP, WP)


def test_whir_rejects_wrong_value():
    committed, z, values = _setup()
    tp = Transcript(b"whir-test")
    proof = whir.open_whir(committed, z, values, tp, BLOWUP, WP)
    bad = values.copy()
    bad[1][0] = (int(bad[1][0]) + 1) % bb.P
    tv = Transcript(b"whir-test")
    with pytest.raises(Exception):
        whir.verify_whir(committed.root, N_VARS, C, z, bad, proof, tv,
                         BLOWUP, WP)


def test_whir_rejects_tampered_final_function():
    committed, z, values = _setup()
    tp = Transcript(b"whir-test")
    proof = whir.open_whir(committed, z, values, tp, BLOWUP, WP)
    proof.final_g = proof.final_g.copy()
    proof.final_g[0][0] = (int(proof.final_g[0][0]) + 1) % bb.P
    tv = Transcript(b"whir-test")
    with pytest.raises(Exception):
        whir.verify_whir(committed.root, N_VARS, C, z, values, proof, tv,
                         BLOWUP, WP)


def test_whir_rejects_tampered_query_leaf():
    committed, z, values = _setup()
    tp = Transcript(b"whir-test")
    proof = whir.open_whir(committed, z, values, tp, BLOWUP, WP)
    qs = proof.iters[0].queries
    qs.leaves = qs.leaves.copy()
    qs.leaves[0][0][0] = (int(qs.leaves[0][0][0]) + 1) % bb.P
    tv = Transcript(b"whir-test")
    with pytest.raises(Exception):
        whir.verify_whir(committed.root, N_VARS, C, z, values, proof, tv,
                         BLOWUP, WP)


def test_whir_zkvm_e2e():
    """PcsKind::Whir analog: full zkVM prove/verify with the WHIR opening."""
    from ceno_tpu.emulator import programs
    from ceno_tpu.zkvm.e2e import run_e2e
    from ceno_tpu.zkvm.scheme import verify
    from ceno_tpu.zkvm.tables import ZKVMConfig

    params = BasefoldParams(blowup_log=1, n_queries=4, stop_size=32,
                            pcs_kind="whir")
    cfg = ZKVMConfig(shl_x_bits=6, mem_words_log=7)
    vm = programs.fibonacci_vm(8)
    res = run_e2e(vm, cfg, params)
    assert verify(res.pk.vk, res.proof)
    op = next(iter(res.proof.witness_openings.values()))
    assert isinstance(op.opening, whir.WhirProof)


def test_whir_rejects_tampered_ood():
    committed, z, values = _setup()
    tp = Transcript(b"whir-test")
    proof = whir.open_whir(committed, z, values, tp, BLOWUP, WP)
    proof.iters[0].y_ood = proof.iters[0].y_ood.copy()
    proof.iters[0].y_ood[0] = (int(proof.iters[0].y_ood[0]) + 1) % bb.P
    tv = Transcript(b"whir-test")
    with pytest.raises(Exception):
        whir.verify_whir(committed.root, N_VARS, C, z, values, proof, tv,
                         BLOWUP, WP)
