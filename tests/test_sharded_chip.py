"""Mesh-parallel FULL chip prove (records -> towers -> main zerocheck)
must produce byte-identical proofs to the single-device prover."""

import numpy as np
import pytest

from ceno_tpu.emulator import programs
from ceno_tpu.hash.transcript import Transcript
from ceno_tpu.parallel import sharded
from ceno_tpu.parallel.chip import prove_chip_sharded
from ceno_tpu.zkvm.chips import build_all_chips
from ceno_tpu.zkvm.chips.opcodes import TraceView
from ceno_tpu.zkvm.e2e import public_values_from_vm
from ceno_tpu.zkvm.witgen import assign_opcode_chips
import ceno_tpu.gkr.chip as chiplib

CHAL = np.array([[5, 7, 11, 13], [17, 19, 23, 29]], np.uint64)


def _assigned_chip(name: str):
    vm = programs.fibonacci_vm(40)
    records = vm.run()
    view = TraceView.from_records(records)
    assigned = assign_opcode_chips(view, build_all_chips())
    a = [c for c in assigned if c.name == name][0]
    pv = public_values_from_vm(vm)
    return a, pv


@pytest.mark.slow
def test_full_chip_prove_sharded_matches_single_device():
    a, pv = _assigned_chip("add")
    assert a.num_instances > 8
    n = a.wit.shape[1]
    fixed = np.zeros((0, n), np.uint64)
    structural = np.zeros((0, n), np.uint64)

    single_proof, single_open = chiplib.prove_chip(
        a.compiled, a.wit, fixed, structural, pv, a.num_instances, CHAL,
        Transcript(b"chip-dryrun"),
    )
    mesh = sharded.make_mesh(8)
    multi_proof, multi_open = prove_chip_sharded(
        mesh, a.compiled, a.wit, fixed, structural, pv, a.num_instances,
        CHAL, Transcript(b"chip-dryrun"),
    )

    assert np.array_equal(single_proof.main_msgs, multi_proof.main_msgs)
    assert np.array_equal(single_proof.wit_evals, multi_proof.wit_evals)
    tp_s, tp_m = single_proof.tower_proof, multi_proof.tower_proof
    assert np.array_equal(tp_s.prod_out, tp_m.prod_out)
    assert np.array_equal(tp_s.logup_out, tp_m.logup_out)
    assert len(tp_s.round_msgs) == len(tp_m.round_msgs)
    for ms, mm in zip(tp_s.round_msgs, tp_m.round_msgs):
        assert np.array_equal(ms, mm)
    for es, em in zip(tp_s.level_evals, tp_m.level_evals):
        assert np.array_equal(es, em)
    assert np.array_equal(single_open.point, multi_open.point)


@pytest.mark.slow
def test_sharded_chip_verifies():
    a, pv = _assigned_chip("addi")
    n = a.wit.shape[1]
    fixed = np.zeros((0, n), np.uint64)
    structural = np.zeros((0, n), np.uint64)
    mesh = sharded.make_mesh(8)
    proof, opening = prove_chip_sharded(
        mesh, a.compiled, a.wit, fixed, structural, pv, a.num_instances,
        CHAL, Transcript(b"chip-dryrun2"),
    )
    op2, prods, fracs = chiplib.verify_chip(
        a.compiled, proof, pv, CHAL, Transcript(b"chip-dryrun2")
    )
    assert np.array_equal(op2.point, opening.point)
