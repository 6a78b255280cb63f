"""Extended opcode coverage: a torture guest exercising all RV32I ops,
validated via the emulator + MockProver (constraints + bus balance)."""

import numpy as np
import pytest

from ceno_tpu.emulator import rv32im
from ceno_tpu.emulator.state import VMState, make_program, Platform
from ceno_tpu.gkr.mock import MockProver
from ceno_tpu.zkvm.chips import build_all_chips
from ceno_tpu.zkvm.tables import build_tables, ZKVMConfig
from ceno_tpu.zkvm.witgen import generate_witness
from ceno_tpu.zkvm.e2e import public_values_from_vm

ROM = 0x0800_0000

TORTURE = """
    li t1, 0x1234abcd
    li t2, 0x0ff0f00f
    and t3, t1, t2
    or t4, t1, t2
    xor t5, t1, t2
    andi t6, t1, 0x7ff
    ori s2, t1, 0x70f
    xori s3, t1, -1
    slt s4, t1, t2
    sltu s5, t1, t2
    slti s6, t1, -5
    sltiu s7, t1, 100
    srli s8, t1, 7
    srai s9, t1, 3
    srli s10, t1, 20
    srai s11, t1, 29
    li t4, 7
    sll a4, t1, t4
    srl a5, t1, t4
    sra a6, t2, t4
    li t4, 21
    sll a7, t1, t4
    srl s2, t1, t4
    sra s3, t2, t4
    blt t2, t1, l1
    addi zero, zero, 0
l1:
    bge t1, t2, l2
    addi zero, zero, 0
l2:
    bltu t1, t2, l3
    addi s2, s2, 1
l3:
    bgeu t2, t1, l4
    addi s3, s3, 0
l4:
    auipc a2, 3
    jal ra, sub1
    j after
sub1:
    jalr zero, 0(ra)
after:
    li t1, 0x1234abcd
    li t2, 0xfff0f00f
    mul gp, t1, t2
    mulh s2, t1, t2
    mulhu s3, t1, t2
    mulhsu s4, t1, t2
    div s5, t1, t2
    divu s6, t1, t2
    rem s7, t1, t2
    remu s8, t1, t2
    li t3, 0
    div s9, t1, t3      # divide by zero cases
    rem s10, t1, t3
    divu s11, t1, t3
    li t4, 0x80000000
    li t5, 0xffffffff
    div a1, t4, t5      # signed overflow case
    rem a2, t4, t5
    li a3, {heap}
    li a4, 0xdeadbeef
    sw a4, 0(a3)
    lb a5, 1(a3)
    lbu a6, 1(a3)
    lh a7, 2(a3)
    lhu t1, 2(a3)
    sb t2, 2(a3)
    sh t2, 0(a3)
    lw t3, 0(a3)
    sub t4, t3, t2
    mv a0, t3
    li t0, 0
    ecall
"""


def _run_torture():
    src = TORTURE.format(heap=Platform.heap_start)
    words = rv32im.assemble(src, ROM)
    vm = VMState(make_program(words, ROM), ROM)
    records = vm.run()
    assert vm.halted
    return vm, records


def test_torture_executes_correctly():
    vm, records = _run_torture()
    # spot semantic checks vs python
    t1, t2 = 0x1234ABCD, 0x0FF0F00F
    # after stores: word at heap = sh t2 over [deadbeef with byte2=0f] ...
    w = vm.mem[Platform.heap_start >> 2]
    expect = 0xDEADBEEF
    expect = (expect & ~(0xFF << 16)) | ((t2 & 0xFF) << 16)  # sb t2, 2
    expect = (expect & ~0xFFFF) | (t2 & 0xFFFF)              # sh t2, 0
    assert w == expect, hex(w)
    kinds = {r.insn.name for r in records}
    for op in ("AND", "OR", "XOR", "ANDI", "ORI", "XORI", "SLT", "SLTU",
               "SLTI", "SLTIU", "SRLI", "SRAI", "BLT", "BGE", "BLTU", "BGEU",
               "AUIPC", "JAL", "JALR", "LB", "LBU", "LH", "LHU", "SB", "SH",
               "LW", "SW", "SUB", "MUL", "MULH", "MULHU", "MULHSU",
               "DIV", "DIVU", "REM", "REMU", "SLL", "SRL", "SRA"):
        assert op in kinds, f"torture guest never executed {op}"
    # M-extension semantic spot checks vs python ints
    t1v, t2v = 0x1234ABCD, 0xFFF0F00F
    st1, st2 = t1v - (1 << 32) * (t1v >> 31), t2v - (1 << 32) * (t2v >> 31)
    assert vm.regs[3] == (t1v * t2v) & 0xFFFFFFFF            # mul gp
    assert vm.regs[18] == ((st1 * st2) >> 32) & 0xFFFFFFFF   # mulh s2
    assert vm.regs[19] == ((t1v * t2v) >> 32) & 0xFFFFFFFF   # mulhu s3
    assert vm.regs[20] == ((st1 * t2v) >> 32) & 0xFFFFFFFF   # mulhsu s4
    q = abs(st1) // abs(st2)
    assert vm.regs[21] == (-q if (st1 < 0) != (st2 < 0) else q) & 0xFFFFFFFF  # div
    assert vm.regs[25] == 0xFFFFFFFF                         # div by zero s9
    assert vm.regs[11] == 0x80000000                         # overflow div a1
    assert vm.regs[12] == 0                                  # overflow rem a2


@pytest.mark.slow
def test_torture_proves_and_verifies():
    from ceno_tpu.pcs.basefold import BasefoldParams
    from ceno_tpu.zkvm.e2e import run_e2e
    from ceno_tpu.zkvm.scheme import verify

    src = TORTURE.format(heap=Platform.heap_start)
    words = rv32im.assemble(src, ROM)
    vm = VMState(make_program(words, ROM), ROM)
    res = run_e2e(
        vm,
        ZKVMConfig(shl_x_bits=16, mem_words_log=7),
        BasefoldParams(blowup_log=1, n_queries=4, stop_size=32),
    )
    assert verify(res.pk.vk, res.proof)


def test_torture_constraints_satisfied():
    vm, records = _run_torture()
    cfg = ZKVMConfig(shl_x_bits=16, mem_words_log=7)
    from ceno_tpu.zkvm.chips.dyn_ram import build_dyn_ram_chips

    chips = build_all_chips()
    tables = build_tables(vm.program, cfg)
    pv = public_values_from_vm(vm, cfg)
    assigned = generate_witness(
        records, chips, tables, vm, pv, cfg,
        dyn_chips=build_dyn_ram_chips(cfg),
    )
    mock = []
    for a in assigned:
        n = a.n_rows
        fixed = np.zeros((0, n), np.uint64)
        for t in tables:
            if t.name == a.name and t.cb.fixed_names:
                fx = np.asarray(t.fixed_fn(), np.uint64)
                fixed = np.pad(fx, ((0, 0), (0, n - fx.shape[1])))
        mock.append((a.compiled, a.cb, a.wit, fixed, pv, a.num_instances))
    errs = MockProver.assert_satisfied(mock, raise_on_error=False)
    assert errs == [], errs[:8]
