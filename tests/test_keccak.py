"""Keccak precompile: host mirror vs hashlib, mock, e2e, and tamper tests."""

import hashlib

import numpy as np
import pytest

from ceno_tpu.emulator.keccak import (
    keccakf, keccakf_rounds_np, lanes_to_words, words_to_lanes,
)
from ceno_tpu.emulator.rv32im import assemble, K
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

GUEST = f"""
    li t1, {HEAP}
    li a1, 7
    sw a1, 0(t1)
    li t0, {Platform.ECALL_KECCAK}
    mv a0, t1
    ecall
    lw a2, 0(t1)
    li t0, 0
    li a0, 0
    ecall
"""


def _sha3_256(msg: bytes) -> bytes:
    """SHA3-256 sponge over our keccakf (rate 136, pad 0x06..0x80)."""
    state = [0] * 25
    block = bytearray(136)
    block[: len(msg)] = msg
    block[len(msg)] = 0x06
    block[135] |= 0x80
    for i in range(17):
        state[i] ^= int.from_bytes(block[8 * i : 8 * i + 8], "little")
    state = keccakf(state)
    return b"".join(s.to_bytes(8, "little") for s in state[:4])


def test_keccakf_matches_hashlib_sha3():
    for msg in (b"", b"ceno-tpu", bytes(range(100))):
        assert _sha3_256(msg) == hashlib.sha3_256(msg).digest()


def test_numpy_rounds_match_scalar():
    rng = np.random.default_rng(0)
    st = rng.integers(0, 1 << 64, size=(3, 25), dtype=np.uint64)
    outs = keccakf_rounds_np(st)
    for i in range(3):
        assert [int(v) for v in outs[24, i]] == keccakf([int(v) for v in st[i]])


def _run_guest():
    vm = VMState(make_program(assemble(GUEST, ROM), ROM), ROM)
    records = vm.run()
    exp = lanes_to_words(keccakf(words_to_lanes([7] + [0] * 49)))
    assert vm.mem[HEAP >> 2] == exp[0]
    return vm, records


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


def test_keccak_mock_satisfied():
    vm, records = _run_guest()
    pk = keygen(vm.program, CFG, PARAMS)
    pv = public_values_from_vm(vm, CFG)
    assigned = generate_witness(
        records, pk.opcode_chips, pk.tables, vm, pv, CFG,
        shard_chips=pk.shard_chips, dyn_chips=pk.dyn_chips,
    )
    errs = _mock(vm, pk, assigned, pv)
    assert errs == [], errs[:5]


def test_keccak_wrong_output_unsatisfied():
    """Corrupting the syscall's memory writes must break the Custom bus."""
    vm, records = _run_guest()
    view = TraceView.from_records(records)
    view.sys_val = view.sys_val.copy()
    view.sys_val[0, 3] ^= 1
    pk = keygen(vm.program, CFG, PARAMS)
    pv = public_values_from_vm(vm, CFG)
    assigned = generate_witness(
        view, pk.opcode_chips, pk.tables, vm, pv, CFG,
        shard_chips=pk.shard_chips, dyn_chips=pk.dyn_chips,
    )
    errs = _mock(vm, pk, assigned, pv)
    assert errs, "tampered keccak output must be caught"


@pytest.mark.slow
def test_keccak_e2e_proves_and_verifies():
    vm, _ = _run_guest()
    vm2 = VMState(make_program(assemble(GUEST, ROM), ROM), ROM)
    res = run_e2e(vm2, CFG, PARAMS)
    assert verify(res.pk.vk, res.proof)
    assert vm2.regs[12] == vm.mem[HEAP >> 2] & 0xFFFFFFFF
