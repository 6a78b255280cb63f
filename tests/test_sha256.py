"""SHA_EXTEND precompile: host mirror, mock, e2e, and tamper tests."""

import numpy as np

from ceno_tpu.emulator.rv32im import assemble
from ceno_tpu.emulator.state import VMState, make_program, Platform
from ceno_tpu.gkr.mock import MockProver
from ceno_tpu.pcs.basefold import BasefoldParams
from ceno_tpu.zkvm.e2e import public_values_from_vm, run_e2e
from ceno_tpu.zkvm.scheme import keygen, verify
from ceno_tpu.zkvm.tables import ZKVMConfig
from ceno_tpu.zkvm.witgen import generate_witness
from ceno_tpu.zkvm.chips.opcodes import TraceView

ROM, HEAP = Platform.rom_start, Platform.heap_start
CFG = ZKVMConfig(shl_x_bits=6, mem_words_log=7)
PARAMS = BasefoldParams(blowup_log=1, n_queries=4, stop_size=32)

N_EXTENDS = 48  # full message schedule w[16..63]

# w[j] = (j+1) * 0x01010101 for j < 16, then extend to w[63]
GUEST = f"""
    li t1, {HEAP}
    li t2, 16
    li t3, 0
    li t4, 0x01010101
    mv t5, t4
init:
    beq t3, t2, extend
    slli t6, t3, 2
    add t6, t6, t1
    sw t5, 0(t6)
    add t5, t5, t4
    addi t3, t3, 1
    j init
extend:
    li t2, 64
ext_loop:
    beq t3, t2, done
    slli t6, t3, 2
    add a0, t6, t1
    li t0, {Platform.ECALL_SHA_EXTEND}
    ecall
    addi t3, t3, 1
    j ext_loop
done:
    li t1, {HEAP}
    lw a0, 252(t1)   # w[63]
    li t0, 0
    ecall
"""


def _ror(v, r):
    return ((v >> r) | (v << (32 - r))) & 0xFFFFFFFF


def _schedule():
    w = [((j + 1) * 0x01010101) & 0xFFFFFFFF for j in range(16)]
    for i in range(16, 64):
        s0 = _ror(w[i - 15], 7) ^ _ror(w[i - 15], 18) ^ (w[i - 15] >> 3)
        s1 = _ror(w[i - 2], 17) ^ _ror(w[i - 2], 19) ^ (w[i - 2] >> 10)
        w.append((w[i - 16] + s0 + w[i - 7] + s1) & 0xFFFFFFFF)
    return w


def _run_guest():
    vm = VMState(make_program(assemble(GUEST, ROM), ROM), ROM)
    records = vm.run()
    assert vm.halted
    return vm, records


def test_sha_extend_emulates_correctly():
    vm, records = _run_guest()
    w = _schedule()
    for i in range(64):
        assert vm.mem[(HEAP >> 2) + i] == w[i], f"w[{i}]"
    assert vm.exit_code == w[63]


def test_sha_extend_native_matches_python():
    from ceno_tpu.emulator import native

    if not native.native_available():
        return
    vm = VMState(make_program(assemble(GUEST, ROM), ROM), ROM)
    trace = native.run_trace(vm)
    w = _schedule()
    assert vm.mem[(HEAP >> 2) + 63] == w[63]
    # the trace carries 48 sys blocks, 5 live entries each
    n_sys = int((trace.sys_idx >= 0).sum())
    assert n_sys == N_EXTENDS


def _mock(vm, pk, assigned, pv):
    chips = []
    for a in assigned:
        n = a.n_rows
        fixed = np.zeros((0, n), np.uint64)
        for t in pk.tables:
            if t.name == a.name and t.cb.fixed_names:
                fx = np.asarray(t.fixed_fn(), np.uint64)
                fixed = np.pad(fx, ((0, 0), (0, n - fx.shape[1])))
        chips.append((a.compiled, a.cb, a.wit, fixed, pv, a.num_instances))
    return MockProver.assert_satisfied(chips, raise_on_error=False)


def test_sha_extend_mock_satisfied():
    vm, records = _run_guest()
    pk = keygen(vm.program, CFG, PARAMS)
    pv = public_values_from_vm(vm, CFG)
    assigned = generate_witness(
        records, pk.opcode_chips, pk.tables, vm, pv, CFG,
        shard_chips=pk.shard_chips, dyn_chips=pk.dyn_chips,
    )
    errs = _mock(vm, pk, assigned, pv)
    assert errs == [], errs[:5]


def test_sha_extend_wrong_output_unsatisfied():
    """Corrupting the written w[i] must break the offline memory checking."""
    vm, records = _run_guest()
    view = TraceView.from_records(records)
    view.sys_val = view.sys_val.copy()
    view.sys_val[0, 4] ^= 1  # the write entry of the first extend
    pk = keygen(vm.program, CFG, PARAMS)
    pv = public_values_from_vm(vm, CFG)
    import pytest

    with pytest.raises(AssertionError):
        # witgen's own consistency assert catches a forged write; a prover
        # skipping witgen still fails the mock/bus (same record mismatch)
        generate_witness(
            view, pk.opcode_chips, pk.tables, vm, pv, CFG,
            shard_chips=pk.shard_chips, dyn_chips=pk.dyn_chips,
        )


def test_sha_extend_e2e_proves_and_verifies():
    vm, _ = _run_guest()
    vm2 = VMState(make_program(assemble(GUEST, ROM), ROM), ROM)
    res = run_e2e(vm2, CFG, PARAMS)
    assert verify(res.pk.vk, res.proof)
    assert res.proof.public_values is not None
    w = _schedule()
    assert vm2.exit_code == w[63]
