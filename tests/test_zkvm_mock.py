"""zkVM circuits under the MockProver: constraint + bus balance debugging.

This is the cheap harness (no proving): assign witness from real traces and
check every constraint row-by-row plus global record balance, mirroring the
reference's MOCK_PROVING path (SURVEY.md §4.2).
"""

import numpy as np

from ceno_tpu.emulator import programs
from ceno_tpu.gkr.mock import MockProver
from ceno_tpu.gkr.chip import structural_table
from ceno_tpu.zkvm.chips.opcodes import build_opcode_chips
from ceno_tpu.zkvm.tables import build_tables, ZKVMConfig
from ceno_tpu.zkvm.witgen import generate_witness
from ceno_tpu.zkvm.e2e import public_values_from_vm


def _mock_chips(vm, records, cfg):
    from ceno_tpu.zkvm.chips.dyn_ram import build_dyn_ram_chips

    opcode_chips = build_opcode_chips()
    tables = build_tables(vm.program, cfg)
    pv = public_values_from_vm(vm, cfg)
    assigned = generate_witness(
        records, opcode_chips, tables, vm, pv, cfg,
        dyn_chips=build_dyn_ram_chips(cfg),
    )
    chips = []
    for a in assigned:
        n = a.n_rows
        fixed = np.zeros((0, n), np.uint64)
        for t in tables:
            if t.name == a.name and t.cb.fixed_names:
                fx = np.asarray(t.fixed_fn(), np.uint64)
                fixed = np.pad(fx, ((0, 0), (0, n - fx.shape[1])))
        chips.append((a.compiled, a.cb, a.wit, fixed, pv, a.num_instances))
    return chips


def test_fibonacci_constraints_satisfied():
    vm = programs.fibonacci_vm(10)
    records = vm.run()
    cfg = ZKVMConfig(shl_x_bits=6, mem_words_log=7)
    errs = MockProver.assert_satisfied(_mock_chips(vm, records, cfg), raise_on_error=False)
    assert errs == [], errs[:5]


def test_memsum_constraints_satisfied():
    vm = programs.memsum_vm(9)
    records = vm.run()
    cfg = ZKVMConfig(shl_x_bits=6, mem_words_log=7)
    errs = MockProver.assert_satisfied(_mock_chips(vm, records, cfg), raise_on_error=False)
    assert errs == [], errs[:5]


def test_mock_catches_bad_witness():
    vm = programs.fibonacci_vm(6)
    records = vm.run()
    cfg = ZKVMConfig(shl_x_bits=6, mem_words_log=7)
    chips = _mock_chips(vm, records, cfg)
    # corrupt an add result limb
    for i, (compiled, cb, wit, fixed, pv, k) in enumerate(chips):
        if compiled.name == "add" and k > 0:
            wit = wit.copy()
            idx = cb.wit_names.index("rd_lo")
            wit[idx, 0] += 1
            chips[i] = (compiled, cb, wit, fixed, pv, k)
            break
    errs = MockProver.assert_satisfied(chips, raise_on_error=False)
    assert errs, "corruption must be detected"


def test_mock_proving_env_gate_catches_bad_witness(monkeypatch):
    """CENO_MOCK_PROVING=1 (MOCK_PROVING e2e mirror): prove() row-checks
    every chip before proving and reports a named constraint error."""
    import pytest

    from ceno_tpu.emulator import programs, native
    from ceno_tpu.pcs.basefold import BasefoldParams
    from ceno_tpu.zkvm import witgen as W
    from ceno_tpu.zkvm.e2e import public_values_from_vm
    from ceno_tpu.zkvm.scheme import keygen, prove
    from ceno_tpu.zkvm.tables import ZKVMConfig

    cfg = ZKVMConfig(shl_x_bits=6, mem_words_log=7)
    params = BasefoldParams(blowup_log=1, n_queries=4, stop_size=32)
    vm = programs.fibonacci_vm(40)
    trace = native.run_trace(vm)
    pv = public_values_from_vm(vm, cfg)
    pk = keygen(vm.program, cfg, params)
    monkeypatch.setenv("CENO_MOCK_PROVING", "1")

    orig = W.generate_witness

    def corrupting(*a, **kw):
        assigned = orig(*a, **kw)
        for ch in assigned:
            if ch.name == "add" and ch.num_instances:
                ch.wit[3, 0] = (int(ch.wit[3, 0]) + 1) % 2013265921
                break
        return assigned

    import ceno_tpu.zkvm.scheme as scheme

    monkeypatch.setattr(scheme, "generate_witness", corrupting)
    with pytest.raises(AssertionError, match="MockProver failures"):
        prove(pk, vm, trace, pv)
