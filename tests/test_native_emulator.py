"""Native C++ emulator must match the Python interpreter record-for-record."""

import numpy as np
import pytest

from ceno_tpu.emulator import programs, rv32im
from ceno_tpu.emulator.state import VMState, make_program, Platform
from ceno_tpu.emulator import native


pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="no C++ toolchain"
)


def _records_equal(a, b):
    assert len(a) == len(b), (len(a), len(b))
    for i, (x, y) in enumerate(zip(a, b)):
        assert x.cycle == y.cycle and x.pc == y.pc and x.next_pc == y.next_pc, i
        assert x.insn.kind == y.insn.kind, (i, x.insn.name, y.insn.name)
        assert (x.insn.rd, x.insn.rs1, x.insn.rs2, x.insn.imm) == (
            y.insn.rd, y.insn.rs1, y.insn.rs2, y.insn.imm,
        ), i
        assert x.rs1 == y.rs1 and x.rs2 == y.rs2, i
        assert x.rd == y.rd and x.mem == y.mem, i


def _compare(make_vm):
    vm_py = make_vm()
    rec_py = vm_py.run()
    vm_nat = make_vm()
    rec_nat = native.run_native(vm_nat)
    _records_equal(rec_py, rec_nat)
    assert vm_py.regs == vm_nat.regs
    assert vm_py.reg_ts == vm_nat.reg_ts
    assert vm_py.pc == vm_nat.pc and vm_py.cycle == vm_nat.cycle
    assert vm_py.exit_code == vm_nat.exit_code
    assert {w: vm_py.mem[w] for w in vm_py.touched} == {
        w: vm_nat.mem[w] for w in vm_nat.touched
    }


def test_native_fibonacci():
    _compare(lambda: programs.fibonacci_vm(25))


def test_native_memsum():
    _compare(lambda: programs.memsum_vm(13))


def test_native_hinted():
    _compare(lambda: programs.fibonacci_hinted_vm(12))


def test_native_torture():
    from tests.test_zkvm_extended import TORTURE, ROM

    def mk():
        src = TORTURE.format(heap=Platform.heap_start)
        return VMState(make_program(rv32im.assemble(src, ROM), ROM), ROM)

    _compare(mk)


def test_native_trace_speed():
    """The columnar fast path (run_trace: C++ core -> numpy columns, no
    python step objects) must decisively beat the python interpreter."""
    import time

    vm = programs.fibonacci_vm(30000)
    t0 = time.time()
    view = native.run_trace(vm)
    dt_native = time.time() - t0
    assert vm.halted and view.n > 150000
    vm2 = programs.fibonacci_vm(30000)
    t0 = time.time()
    rec2 = vm2.run()
    dt_py = time.time() - t0
    assert dt_native < dt_py / 2, (dt_native, dt_py)


def test_native_trace_matches_records():
    vm = programs.fibonacci_hinted_vm(11)
    view = native.run_trace(vm)
    vm2 = programs.fibonacci_hinted_vm(11)
    from ceno_tpu.zkvm.chips.opcodes import TraceView

    ref = TraceView.from_records(vm2.run())
    for f in ref.__dataclass_fields__:
        if f == "n":
            continue
        np.testing.assert_array_equal(
            getattr(view, f), getattr(ref, f), err_msg=f
        )


def test_native_syscalls_match_python():
    """keccak + pubio-commit records and digest identical across backends."""
    from ceno_tpu.emulator import native
    from ceno_tpu.emulator.rv32im import assemble
    from ceno_tpu.emulator.state import VMState, make_program, Platform

    if not native.native_available():
        import pytest

        pytest.skip("no C++ toolchain")
    ROM, HEAP = Platform.rom_start, Platform.heap_start
    src = f"""
        li t1, {HEAP}
        li a1, 7
        sw a1, 0(t1)
        li t0, {Platform.ECALL_KECCAK}
        mv a0, t1
        ecall
        mv a0, t1
        li t0, {Platform.ECALL_COMMIT}
        ecall
        li t0, 0
        li a0, 0
        ecall
    """
    vm_n = VMState(make_program(assemble(src, ROM), ROM), ROM)
    recs_n = native.run_native(vm_n)
    vm_p = VMState(make_program(assemble(src, ROM), ROM), ROM)
    recs_p = vm_p.run()
    assert len(recs_n) == len(recs_p)
    for a, b in zip(recs_n, recs_p):
        assert (a.pc, a.next_pc, a.cycle, a.rs1, a.rs2, a.rd, a.mem,
                a.sys_mem) == (b.pc, b.next_pc, b.cycle, b.rs1, b.rs2,
                               b.rd, b.mem, b.sys_mem)
    assert vm_n.pubio_digest == vm_p.pubio_digest
    assert vm_n.mem == vm_p.mem


def test_native_trace_syscall_kinds():
    from ceno_tpu.emulator import native
    from ceno_tpu.emulator.rv32im import assemble, K
    from ceno_tpu.emulator.state import VMState, make_program, Platform

    if not native.native_available():
        import pytest

        pytest.skip("no C++ toolchain")
    ROM, HEAP = Platform.rom_start, Platform.heap_start
    src = f"""
        li t1, {HEAP}
        li t0, {Platform.ECALL_KECCAK}
        mv a0, t1
        ecall
        li t0, 0
        li a0, 0
        ecall
    """
    vm = VMState(make_program(assemble(src, ROM), ROM), ROM)
    view = native.run_trace(vm)
    kk = np.nonzero(view.kind == K["SYS_KECCAK"])[0]
    assert len(kk) == 1
    assert view.sys_idx[kk[0]] == 0
    assert view.sys_addr.shape == (1, 50)
