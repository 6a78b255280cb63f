"""UINT256_MUL precompile: emulator mirror, mock, tamper, and e2e tests."""

import numpy as np
import pytest

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

# x at HEAP, y at HEAP+64, modulus at HEAP+96. Three calls:
#   1) x*y mod m (odd modulus)
#   2) result*y mod 0 (mod 2^256 truncation path)
#   3) result*y mod m again
X0 = 0xDEADBEEF_12345678_90ABCDEF_55AA55AA_0F0F0F0F_12312312_FFFFFFFF_00C0FFEE
Y0 = 0x00000001_00000000_00000000_00000000_00000000_00000000_DEADF00D_13371337
M0 = 0xFFFFFFFF_FFFFFFFF_FFFFFFFF_FFFFFFFE_BAAEDCE6_AF48A03B_BFD25E8C_D0364141


def _store_words(value, base_reg, off):
    out = []
    for i in range(8):
        w = (value >> (32 * i)) & 0xFFFFFFFF
        out.append(f"    li t5, {w}")
        out.append(f"    sw t5, {off + 4 * i}({base_reg})")
    return "\n".join(out)


GUEST = f"""
    li t1, {HEAP}
{_store_words(X0, "t1", 0)}
{_store_words(Y0, "t1", 64)}
{_store_words(M0, "t1", 96)}
    li t0, {Platform.ECALL_UINT256_MUL}
    mv a0, t1
    addi a1, t1, 64
    ecall
    ecall
    li t2, {HEAP + 96}
{chr(10).join(f"    sw zero, {4 * i}(t2)" for i in range(8))}
    li t0, {Platform.ECALL_UINT256_MUL}
    ecall
    lw a0, 0(t1)
    li t0, 0
    ecall
"""


def _expected():
    r = (X0 * Y0) % M0
    r = (r * Y0) % M0
    r = (r * Y0) & ((1 << 256) - 1)
    return r


def _run_guest():
    vm = VMState(make_program(assemble(GUEST, ROM), ROM), ROM)
    records = vm.run()
    assert vm.halted
    return vm, records


def _read256(vm, base_w):
    return sum(vm.mem.get(base_w + i, 0) << (32 * i) for i in range(8))


def test_uint256_emulates_correctly():
    vm, _ = _run_guest()
    assert _read256(vm, HEAP >> 2) == _expected()
    assert vm.exit_code == _expected() & 0xFFFFFFFF


def test_uint256_native_matches_python():
    from ceno_tpu.emulator import native

    if not native.native_available():
        return
    vm = VMState(make_program(assemble(GUEST, ROM), ROM), ROM)
    native.run_trace(vm)
    assert _read256(vm, HEAP >> 2) == _expected()


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


def test_uint256_mock_satisfied():
    vm, records = _run_guest()
    pk = keygen(vm.program, CFG, PARAMS)
    pv = public_values_from_vm(vm, CFG)
    assigned = generate_witness(
        records, pk.opcode_chips, pk.tables, vm, pv, CFG,
        shard_chips=pk.shard_chips, dyn_chips=pk.dyn_chips,
    )
    errs = _mock(vm, pk, assigned, pv)
    assert errs == [], errs[:5]


def test_uint256_forged_result_rejected():
    vm, records = _run_guest()
    view = TraceView.from_records(records)
    view.sys_val = view.sys_val.copy()
    view.sys_val[0, 0] ^= 1  # forge the first result word
    pk = keygen(vm.program, CFG, PARAMS)
    pv = public_values_from_vm(vm, CFG)
    with pytest.raises(AssertionError):
        generate_witness(
            view, pk.opcode_chips, pk.tables, vm, pv, CFG,
            shard_chips=pk.shard_chips, dyn_chips=pk.dyn_chips,
        )


def test_uint256_e2e_proves_and_verifies():
    vm, _ = _run_guest()
    vm2 = VMState(make_program(assemble(GUEST, ROM), ROM), ROM)
    res = run_e2e(vm2, CFG, PARAMS)
    assert verify(res.pk.vk, res.proof)
    assert vm2.exit_code == _expected() & 0xFFFFFFFF
