"""CenoStdin hints serde: roundtrip and guest-visible layout."""

import numpy as np

from ceno_tpu.host.stdin import CenoStdin, NONE, Some, U64, from_words, to_item_words
from ceno_tpu.emulator.rv32im import assemble
from ceno_tpu.emulator.state import VMState, make_program, Platform


def test_roundtrip():
    s = CenoStdin()
    s.write(42)
    s.write(U64(0x1_0000_0001))
    s.write("hello ceno")
    s.write(b"\x01\x02\x03")
    s.write([7, 8, 9])
    s.write((1, 2))
    s.write(Some(5))
    s.write(NONE)
    words = s.to_words()
    vals = from_words(words, [
        "u32", "u64", "str", "bytes", ("list", "u32"),
        ("tuple", ["u32", "u32"]), ("option", "u32"), ("option", "u32"),
    ])
    assert vals == [
        42, 0x1_0000_0001, "hello ceno", b"\x01\x02\x03", [7, 8, 9],
        (1, 2), 5, None,
    ]


def test_header_layout_matches_reference():
    """[data_offset, alignment, lens...] then blobs (ceno_host Items)."""
    s = CenoStdin()
    s.write(7)          # 1 word
    s.write([1, 2])     # 3 words
    words = s.to_words()
    assert words[0] == 4 * 4          # header = 4 words
    assert words[1] == 4              # alignment
    assert words[2] == 4              # item 0 byte length
    assert words[3] == 12             # item 1 byte length
    assert words[4] == 7
    assert words[5:8] == [2, 1, 2]


def test_guest_reads_serialized_hint():
    """Guest walks the header to the first item and returns it."""
    s = CenoStdin().write(12345)
    words = s.to_words()
    ROM = Platform.rom_start
    src = f"""
        li t1, {Platform.hints_start}
        lw t2, 0(t1)
        add t2, t2, t1
        lw a1, 0(t2)
        li t0, 0
        li a0, 0
        ecall
    """
    vm = VMState(make_program(assemble(src, ROM), ROM), ROM)
    for i, w in enumerate(words):
        vm.init_memory(Platform.hints_start + 4 * i, w)
    vm.run()
    assert vm.regs[11] == 12345
