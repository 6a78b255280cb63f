"""Guest println (info-out region): host reader, e2e prove with info chips."""

import numpy as np

from ceno_tpu.emulator.rv32im import assemble
from ceno_tpu.emulator.state import VMState, make_program, Platform
from ceno_tpu.host import read_all_messages
from ceno_tpu.pcs.basefold import BasefoldParams
from ceno_tpu.zkvm.e2e import run_e2e
from ceno_tpu.zkvm.layout import PV_INFO_WORDS
from ceno_tpu.zkvm.scheme import verify
from ceno_tpu.zkvm.tables import ZKVMConfig

ROM = Platform.rom_start
CFG = ZKVMConfig(shl_x_bits=6, mem_words_log=7)
PARAMS = BasefoldParams(blowup_log=1, n_queries=4, stop_size=32)

# two messages: "hi!" (3 bytes) and "ceno" (4 bytes)
HI = int.from_bytes(b"hi!\x00", "little")
CENO = int.from_bytes(b"ceno", "little")

GUEST = f"""
    li t1, {Platform.info_start}
    li t2, 3
    sw t2, 0(t1)
    li t2, {HI}
    sw t2, 4(t1)
    li t2, 4
    sw t2, 8(t1)
    li t2, {CENO}
    sw t2, 12(t1)
    li a0, 0
    li t0, 0
    ecall
"""


def test_guest_messages_read_back():
    vm = VMState(make_program(assemble(GUEST, ROM), ROM), ROM)
    vm.run()
    assert read_all_messages(vm) == [b"hi!", b"ceno"]


def test_host_run_helper():
    from ceno_tpu.host import run

    vm = VMState(make_program(assemble(GUEST, ROM), ROM), ROM)
    assert run(vm) == [b"hi!", b"ceno"]


def test_println_guest_proves():
    vm = VMState(make_program(assemble(GUEST, ROM), ROM), ROM)
    res = run_e2e(vm, CFG, PARAMS)
    assert int(res.public_values[PV_INFO_WORDS]) == 4  # words used
    assert verify(res.pk.vk, res.proof)
