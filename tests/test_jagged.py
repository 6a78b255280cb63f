"""Jagged PCS: stacking layout, translation sumcheck, tamper rejection."""

import numpy as np
import pytest

from ceno_tpu.fields import babybear as bb
from ceno_tpu.fields import ext4_host as exth
from ceno_tpu.hash.transcript import Transcript
from ceno_tpu.pcs import basefold, jagged
from ceno_tpu.pcs.basefold import BasefoldParams
from ceno_tpu.sumcheck import host_impl as H

PARAMS = BasefoldParams(blowup_log=1, n_queries=4, stop_size=32)
RNG = np.random.default_rng(7)


def _mle_eval(col, z):
    eq = H.build_eq_host(np.asarray(z, np.uint64))
    acc = np.zeros(4, np.uint64)
    for i in range(len(col)):
        acc = exth.add(acc, exth.mul_base(eq[i], np.uint64(col[i])))
    return acc


def _rand_point(n):
    return RNG.integers(0, bb.P, size=(n, 4)).astype(np.uint64)


def _setup():
    # two classes: h=8 (5 columns, partial) and h=32 (3 columns, full)
    classes = [(8, 5), (32, 3)]
    layout = jagged.plan_layout(classes)
    arrs = [
        (8, RNG.integers(0, bb.P, size=(5, 8)).astype(np.uint64)),
        (32, RNG.integers(0, bb.P, size=(3, 32)).astype(np.uint64)),
    ]
    mat = jagged.stack_matrix(layout, arrs)
    committed = basefold.commit(mat, PARAMS)
    z8, z32 = _rand_point(3), _rand_point(5)
    claims = []
    for j in range(5):
        claims.append(jagged.JaggedClaim(j, z8, _mle_eval(arrs[0][1][j], z8)))
    for j in range(3):
        claims.append(
            jagged.JaggedClaim(5 + j, z32, _mle_eval(arrs[1][1][j], z32))
        )
    return layout, mat, committed, claims


def test_layout_packing():
    layout, mat, _, _ = _setup()
    assert layout.n_r == 32
    # class h=8: 4 slices per column -> 2 matrix columns; h=32: 3 columns
    assert layout.n_mat_cols == 5
    # slice 4 of class 8 goes to matrix column 1, block 0
    assert (layout.slices[4].mat_col, layout.slices[4].sub_idx) == (1, 0)
    assert layout.slices[5].mat_col == 2  # first h=32 column


def test_jagged_open_verify_roundtrip():
    layout, mat, committed, claims = _setup()
    tp = Transcript(b"jagged-test")
    proof = jagged.open_jagged(committed, layout, claims, tp, PARAMS)
    tv = Transcript(b"jagged-test")
    jagged.verify_jagged(committed.root, layout, claims, proof, tv, PARAMS)


def test_jagged_device_path_matches_host():
    """The device open (on-device outer-product weight blocks) must produce
    a byte-identical proof to the host path and verify."""
    import jax.numpy as jnp

    layout, mat, committed_h, claims = _setup()
    committed_d = basefold.commit(
        jnp.asarray(bb.np_to_monty(mat.astype(np.uint32))), PARAMS
    )
    tp_h = Transcript(b"jagged-test")
    proof_h = jagged.open_jagged(committed_h, layout, claims, tp_h, PARAMS)
    tp_d = Transcript(b"jagged-test")
    proof_d = jagged.open_jagged(committed_d, layout, claims, tp_d, PARAMS)
    assert np.array_equal(proof_h.trans_msgs, proof_d.trans_msgs)
    assert np.array_equal(proof_h.v_evals, proof_d.v_evals)
    assert np.array_equal(
        proof_h.opening.sumcheck_msgs, proof_d.opening.sumcheck_msgs
    )
    tv = Transcript(b"jagged-test")
    jagged.verify_jagged(committed_d.root, layout, claims, proof_d, tv, PARAMS)


def test_jagged_rejects_wrong_claim():
    layout, mat, committed, claims = _setup()
    tp = Transcript(b"jagged-test")
    proof = jagged.open_jagged(committed, layout, claims, tp, PARAMS)
    bad = [
        jagged.JaggedClaim(c.slice_idx, c.z, c.value.copy()) for c in claims
    ]
    bad[2].value[0] = (int(bad[2].value[0]) + 1) % bb.P
    tv = Transcript(b"jagged-test")
    with pytest.raises(Exception):
        jagged.verify_jagged(committed.root, layout, bad, proof, tv, PARAMS)


def test_jagged_rejects_tampered_eval():
    layout, mat, committed, claims = _setup()
    tp = Transcript(b"jagged-test")
    proof = jagged.open_jagged(committed, layout, claims, tp, PARAMS)
    proof.v_evals = proof.v_evals.copy()
    proof.v_evals[0][0] = (int(proof.v_evals[0][0]) + 1) % bb.P
    tv = Transcript(b"jagged-test")
    with pytest.raises(Exception):
        jagged.verify_jagged(committed.root, layout, claims, proof, tv, PARAMS)
