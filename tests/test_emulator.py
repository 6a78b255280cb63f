"""Emulator: decode roundtrips, program execution, trace invariants."""

import numpy as np

from ceno_tpu.emulator import rv32im, programs
from ceno_tpu.emulator.state import SUBCYCLES_PER_INSN, CYCLE_START


def test_assemble_decode_roundtrip():
    words = rv32im.assemble(
        """
        addi t0, zero, 42
        add t1, t0, t0
        sub t2, t1, t0
        sw t2, 4(sp)
        lw t3, 4(sp)
        beq t3, t2, skip
        addi t4, zero, 1
    skip:
        jal ra, end
    end:
        ecall
        """
    )
    names = [rv32im.decode(w).name for w in words]
    assert names == ["ADDI", "ADD", "SUB", "SW", "LW", "BEQ", "ADDI", "JAL", "ECALL"]
    d = rv32im.decode(words[0])
    assert d.rd == 5 and d.rs1 == 0 and d.imm == 42


def test_fibonacci_runs():
    for n in (1, 2, 10, 30):
        vm = programs.fibonacci_vm(n)
        records = vm.run()
        assert vm.halted
        assert vm.regs[10] == programs.fib_expected(n), n
        # cycle accounting: 4 subcycles per executed instruction
        assert vm.cycle == CYCLE_START + SUBCYCLES_PER_INSN * len(records)


def test_memsum_and_memory_trace():
    n = 17
    vm = programs.memsum_vm(n)
    records = vm.run()
    assert vm.halted
    assert vm.regs[10] == sum(range(n))
    # memory records carry previous timestamps strictly less than access ts
    mem_recs = [r for r in records if r.mem is not None]
    assert len(mem_recs) == 2 * n
    for r in mem_recs:
        waddr, prev_v, new_v, prev_ts = r.mem
        assert prev_ts < r.cycle + 3
    # load records preserve value
    loads = [r for r in records if r.insn.name == "LW"]
    for r in loads:
        assert r.mem[1] == r.mem[2]


def test_trace_register_timestamps_monotone():
    vm = programs.fibonacci_vm(12)
    records = vm.run()
    for r in records:
        if r.rs1:
            assert r.rs1[2] < r.cycle + 1
        if r.rd:
            assert r.rd[3] < r.cycle + 3


def test_branches_and_shifts():
    src = """
        li t1, 0xF0F0
        srli t2, t1, 4
        slli t3, t2, 4
        li t4, -8
        srai t5, t4, 2
        sltu t6, t1, t2
        li t0, 0
        mv a0, t5
        ecall
    """
    from ceno_tpu.emulator.state import VMState, make_program
    words = rv32im.assemble(src)
    vm = VMState(make_program(words), 0x0800_0000)
    vm.run()
    assert vm.regs[30] == (-2) & 0xFFFFFFFF  # t5 = -8 >> 2 arithmetic
    assert vm.regs[31] == 0  # t6
