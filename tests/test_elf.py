"""ELF32 loader: writer round-trip, reference-loader semantics, VM execution."""

import pytest

from ceno_tpu.emulator import programs
from ceno_tpu.emulator.elf import (
    ElfError, Program, load_elf, load_elf_vm, write_elf,
)
from ceno_tpu.emulator.rv32im import assemble
from ceno_tpu.emulator.state import Platform

ROM = 0x0800_0000
SHEAP = Platform.heap_start


def _fib_elf(n):
    words = assemble(programs.FIBONACCI.format(n=n), ROM)
    return write_elf(words, ROM, sheap=SHEAP)


def test_roundtrip_text_only():
    words = assemble(programs.FIBONACCI.format(n=10), ROM)
    prog = load_elf(_fib_elf(10))
    assert prog.entry == ROM
    assert prog.base_address == ROM
    assert prog.sheap == SHEAP
    assert prog.instructions == words
    # image covers the text, padded to a power of two
    assert len(prog.image) >= len(words)
    assert len(prog.image) & (len(prog.image) - 1) == 0


def test_loaded_vm_matches_assembled_vm():
    vm_a = programs.fibonacci_vm(10)
    recs_a = vm_a.run()
    vm_b = load_elf_vm(_fib_elf(10))
    recs_b = vm_b.run()
    assert vm_b.exit_code == vm_a.exit_code
    assert len(recs_a) == len(recs_b)
    assert [r.pc for r in recs_a] == [r.pc for r in recs_b]
    assert vm_b.regs == vm_a.regs


def test_data_segment_and_bss():
    # guest sums 4 words of .rodata into a0
    data_base = 0x0900_0000
    src = f"""
    li t1, {data_base}
    lw a0, 0(t1)
    lw t2, 4(t1)
    add a0, a0, t2
    lw t2, 8(t1)
    add a0, a0, t2
    lw t2, 12(t1)
    add a0, a0, t2
    li t0, 0
    ecall
"""
    words = assemble(src, ROM)
    data = {data_base + 4 * i: v for i, v in enumerate([3, 5, 7, 11])}
    blob = write_elf(words, ROM, data=data, sheap=SHEAP, bss_words=8)
    prog = load_elf(blob)
    img = prog.data_image()
    assert img[data_base >> 2] == 3
    assert img[(data_base >> 2) + 3] == 11
    # bss zero-filled through the _ebss symbol
    assert img[(data_base >> 2) + 4 + 7] == 0
    vm = load_elf_vm(blob)
    vm.run()
    assert vm.regs[10] == 3 + 5 + 7 + 11


def test_rejects_bad_files():
    words = assemble(programs.FIBONACCI.format(n=3), ROM)
    good = write_elf(words, ROM, sheap=SHEAP)
    with pytest.raises(ElfError):
        load_elf(b"not an elf")
    with pytest.raises(ElfError):
        load_elf(good[:40])
    # wrong machine type
    bad = bytearray(good)
    bad[18] = 62  # EM_X86_64
    with pytest.raises(ElfError):
        load_elf(bytes(bad))
    # unaligned entry
    bad = bytearray(good)
    bad[24] = 2
    with pytest.raises(ElfError):
        load_elf(bytes(bad))
    # no _sheap symbol: strip section headers
    bad = bytearray(good)
    bad[48] = 0  # e_shnum = 0
    with pytest.raises(ElfError, match="_sheap"):
        load_elf(bytes(bad))


def test_image_overlap_with_heap_rejected():
    words = assemble(programs.FIBONACCI.format(n=3), ROM)
    blob = write_elf(words, ROM, sheap=ROM + 8)  # heap inside text
    with pytest.raises(ElfError, match="overlap"):
        load_elf(blob)


def test_program_words_contiguous():
    prog = load_elf(_fib_elf(5))
    waddrs = sorted(prog.program_words)
    assert waddrs == list(range(ROM >> 2, (ROM >> 2) + len(prog.instructions)))
