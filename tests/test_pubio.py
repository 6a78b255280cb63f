"""PUB_IO_COMMIT: digest binding between guest commits and public values."""

import numpy as np
import pytest

from ceno_tpu.emulator.keccak import (
    KECCAK_EMPTY_WORDS, keccak256, public_io_digest_words,
)
from ceno_tpu.emulator.rv32im import assemble
from ceno_tpu.emulator.state import VMState, make_program, Platform
from ceno_tpu.pcs.basefold import BasefoldParams
from ceno_tpu.zkvm.e2e import public_values_from_vm, run_e2e
from ceno_tpu.zkvm.layout import PV_PUBIO_DIGEST
from ceno_tpu.zkvm.scheme import verify
from ceno_tpu.zkvm.tables import ZKVMConfig

ROM = Platform.rom_start
HINTS = Platform.hints_start
HEAP = Platform.heap_start
CFG = ZKVMConfig(shl_x_bits=6, mem_words_log=7)
PARAMS = BasefoldParams(blowup_log=1, n_queries=4, stop_size=32)

PUBLIC_WORDS = [0xDEADBEEF, 42, 7]

# copies the hinted 8-word digest to the heap and commits it
GUEST = f"""
    li t1, {HINTS}
    li t2, {HEAP}
    li t3, 8
loop:
    lw a1, 0(t1)
    sw a1, 0(t2)
    addi t1, t1, 4
    addi t2, t2, 4
    addi t3, t3, -1
    bne t3, x0, loop
    li a0, {HEAP}
    li t0, {Platform.ECALL_COMMIT}
    ecall
    li t0, 0
    li a0, 0
    ecall
"""


def test_empty_digest_matches_reference_constant():
    d = keccak256(b"")
    words = [int.from_bytes(d[4 * i : 4 * i + 4], "little") for i in range(8)]
    assert words == KECCAK_EMPTY_WORDS
    assert public_io_digest_words([]) == KECCAK_EMPTY_WORDS


def _committed_vm():
    vm = VMState(make_program(assemble(GUEST, ROM), ROM), ROM)
    for i, w in enumerate(public_io_digest_words(PUBLIC_WORDS)):
        vm.init_memory(HINTS + 4 * i, w)
    return vm


def test_commit_digest_lands_in_public_values():
    vm = _committed_vm()
    vm.run()
    assert vm.pubio_digest == public_io_digest_words(PUBLIC_WORDS)
    pv = public_values_from_vm(vm, CFG)
    for i, w in enumerate(vm.pubio_digest):
        assert int(pv[PV_PUBIO_DIGEST + 2 * i]) == (w & 0xFFFF)
        assert int(pv[PV_PUBIO_DIGEST + 2 * i + 1]) == (w >> 16)


def test_commit_e2e_proves_and_verifies():
    vm = _committed_vm()
    res = run_e2e(vm, CFG, PARAMS)
    assert verify(res.pk.vk, res.proof)
    # the verifier-side comparison (__main__.py --public-io mirror)
    got = [
        int(res.proof.public_values[PV_PUBIO_DIGEST + 2 * i])
        | (int(res.proof.public_values[PV_PUBIO_DIGEST + 2 * i + 1]) << 16)
        for i in range(8)
    ]
    assert got == public_io_digest_words(PUBLIC_WORDS)
    assert got != public_io_digest_words(PUBLIC_WORDS + [1])


def test_forged_digest_pv_rejected():
    """Changing the digest in public values must break the commit chip."""
    from ceno_tpu.zkvm.scheme import keygen, prove, ZKVMError
    from ceno_tpu.gkr.chip import ChipError
    from ceno_tpu.sumcheck.verifier import SumcheckError

    vm = _committed_vm()
    records = vm.run()
    pk = keygen(vm.program, CFG, PARAMS)
    pv = public_values_from_vm(vm, CFG)
    proof = prove(pk, vm, records, pv)
    bad_pv = proof.public_values.copy()
    bad_pv[PV_PUBIO_DIGEST] ^= 1
    proof.public_values = bad_pv
    with pytest.raises((ZKVMError, ChipError, SumcheckError, AssertionError)):
        verify(pk.vk, proof)
