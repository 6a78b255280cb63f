"""In-circuit Poseidon2 gadget vs the host permutation."""

import numpy as np

from ceno_tpu.fields import babybear as bb
from ceno_tpu.gkr.chip import compile_chip
from ceno_tpu.gkr.circuit_builder import CircuitBuilder
from ceno_tpu.gkr.mock import MockProver
from ceno_tpu.hash import poseidon2 as p2
from ceno_tpu.zkvm.chips.poseidon2_gadget import (
    Lin, assign_poseidon2, build_poseidon2,
)

rng = np.random.default_rng(99)


def _build():
    cb = CircuitBuilder("p2test")
    ins = [cb.create_witin(f"in{i}") for i in range(16)]
    outs = build_poseidon2(cb, "p2", [Lin.col(c) for c in ins])
    xcols = [cb.create_witin(f"x{i}") for i in range(7)]
    for i in range(7):
        cb.require_zero(f"x{i}_tie", xcols[i] - outs[i].to_expr())
    return cb, compile_chip(cb)


def _witness(cb, inputs):
    n = inputs.shape[0]
    u_vals, w_vals, final = assign_poseidon2(inputs)
    cols = {}
    for i in range(16):
        cols[f"in{i}"] = inputs[:, i]
    site = 0
    for name in cb.wit_names:
        if name.endswith("_u"):
            cols[name] = u_vals[site]
        elif name.endswith("_w"):
            cols[name] = w_vals[site]
            site += 1
    for i in range(7):
        cols[f"x{i}"] = final[:, i]
    wit = np.zeros((len(cb.wit_names), n), np.uint64)
    for i, name in enumerate(cb.wit_names):
        wit[i] = np.asarray(cols[name], np.uint64)
    return wit, final


def test_gadget_matches_host_permutation():
    cb, compiled = _build()
    n = 4
    inputs = rng.integers(0, bb.P, size=(n, 16), dtype=np.uint32).astype(np.uint64)
    wit, final = _witness(cb, inputs)
    np.testing.assert_array_equal(final.T, p2.permute_host(inputs.T.copy()))
    fixed = np.zeros((0, n), np.uint64)
    pv = np.zeros(6, np.uint64)
    errs = MockProver.assert_satisfied(
        [(compiled, cb, wit, fixed, pv, n)], raise_on_error=False
    )
    # the global record check trivially passes (no records); only constraint rows matter
    errs = [e for e in errs if e.row >= 0]
    assert errs == [], errs[:5]


def test_gadget_rejects_tampered_state():
    cb, compiled = _build()
    inputs = rng.integers(0, bb.P, size=(2, 16), dtype=np.uint32).astype(np.uint64)
    wit, _ = _witness(cb, inputs)
    # corrupt one sbox output
    idx = cb.wit_names.index("p2_i5_w")
    wit[idx, 0] = (wit[idx, 0] + 1) % bb.P
    errs = MockProver.assert_satisfied(
        [(compiled, cb, wit, np.zeros((0, 2), np.uint64), np.zeros(6, np.uint64), 2)],
        raise_on_error=False,
    )
    assert any(e.row >= 0 for e in errs)
