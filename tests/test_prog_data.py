"""Program-image RAM tables: ELF guests with .data/.rodata/.bss prove e2e."""

import numpy as np
import pytest

from ceno_tpu.emulator.elf import load_elf, load_elf_vm, write_elf
from ceno_tpu.emulator.rv32im import assemble
from ceno_tpu.emulator.state import Platform
from ceno_tpu.gkr.mock import MockProver
from ceno_tpu.pcs.basefold import BasefoldParams
from ceno_tpu.zkvm.e2e import run_e2e, public_values_from_vm
from ceno_tpu.zkvm.scheme import keygen, verify
from ceno_tpu.zkvm.shard import prove_shards, verify_shards
from ceno_tpu.zkvm.tables import ZKVMConfig
from ceno_tpu.zkvm.witgen import generate_witness

ROM = 0x0800_0000
DATA = 0x0900_0000
CFG = ZKVMConfig(shl_x_bits=6, mem_words_log=7)
PARAMS = BasefoldParams(blowup_log=1, n_queries=4, stop_size=32)

# sums 4 .rodata words, stores the sum into .data scratch, reads it back
SRC = f"""
    li t1, {DATA}
    lw a0, 0(t1)
    lw t2, 4(t1)
    add a0, a0, t2
    lw t2, 8(t1)
    add a0, a0, t2
    lw t2, 12(t1)
    add a0, a0, t2
    sw a0, 16(t1)
    lw a1, 16(t1)
    li t0, 0
    ecall
"""


def _guest():
    words = assemble(SRC, ROM)
    data = {DATA + 4 * i: v for i, v in enumerate([3, 5, 7, 11, 0])}
    blob = write_elf(words, ROM, data=data, sheap=Platform.heap_start,
                     bss_words=2)
    prog = load_elf(blob)
    vm = load_elf_vm(blob)
    return prog, vm


def test_prog_data_mock_satisfied():
    prog, vm = _guest()
    records = vm.run()
    assert vm.regs[10] == 26
    pk = keygen(vm.program, CFG, PARAMS, data_image=prog.data_image())
    pv = public_values_from_vm(vm)
    assigned = generate_witness(
        records, pk.opcode_chips, pk.tables, vm, pv, CFG,
        data_image=pk.data_image,
    )
    chips = []
    for a in assigned:
        n = a.n_rows
        fixed = np.zeros((0, n), np.uint64)
        for t in pk.tables:
            if t.name == a.name and t.cb.fixed_names:
                fx = np.asarray(t.fixed_fn(), np.uint64)
                fixed = np.pad(fx, ((0, 0), (0, n - fx.shape[1])))
        chips.append((a.compiled, a.cb, a.wit, fixed, pv, a.num_instances))
    errs = MockProver.assert_satisfied(chips, raise_on_error=False)
    assert errs == [], errs[:5]


def test_prog_data_e2e_single_shard():
    prog, vm = _guest()
    res = run_e2e(vm, CFG, PARAMS, data_image=prog.data_image())
    assert verify(res.pk.vk, res.proof)


@pytest.mark.slow
def test_prog_data_sharded():
    prog, vm = _guest()
    records = vm.run()
    pk = keygen(vm.program, CFG, PARAMS, data_image=prog.data_image())
    sproof = prove_shards(pk, vm, records, 5)
    assert sproof.n_shards >= 2
    assert verify_shards(pk.vk, sproof)


def test_image_window_overlap_rejected():
    prog, vm = _guest()
    bad_image = {Platform.heap_start >> 2: 1}
    with pytest.raises(ValueError, match="overlaps"):
        keygen(vm.program, CFG, PARAMS, data_image=bad_image)
