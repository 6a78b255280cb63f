"""Precompile torture guest (examples/precompile_torture.s): keccak-f,
SHA extend, uint256-mul and PUB_IO_COMMIT chained in one program, each
stage consuming the previous one's output — the cross-precompile e2e
story a single-syscall test cannot give. Expected values are recomputed
independently in python; the guest mock-proves and (slow) fully proves."""

import numpy as np
import pytest

from ceno_tpu.emulator import native
from ceno_tpu.emulator.keccak import keccakf, lanes_to_words, words_to_lanes
from ceno_tpu.emulator.rv32im import assemble
from ceno_tpu.emulator.state import Platform, VMState, make_program
from ceno_tpu.pcs.basefold import BasefoldParams
from ceno_tpu.zkvm.e2e import run_e2e
from ceno_tpu.zkvm.scheme import verify
from ceno_tpu.zkvm.tables import ZKVMConfig

ROM = Platform.rom_start
HEAP = Platform.heap_start
CFG = ZKVMConfig(shl_x_bits=6, mem_words_log=7)
PARAMS = BasefoldParams(blowup_log=1, n_queries=4, stop_size=32)


def _guest_src() -> str:
    return open("examples/precompile_torture.s").read().format(
        heap=HEAP, w_base=HEAP + 512, x_base=HEAP + 1024,
        keccak=Platform.ECALL_KECCAK, sha_extend=Platform.ECALL_SHA_EXTEND,
        uint256=Platform.ECALL_UINT256_MUL, commit=Platform.ECALL_COMMIT,
    )


def _expected():
    state = [((i * 2654435761) & 0xFFFFFFFF) % 65521 for i in range(50)]
    out = lanes_to_words(keccakf(words_to_lanes(state)))
    # sha extend over w = out[0..16]
    w = list(out[:16])

    def ror(v, k):
        return ((v >> k) | (v << (32 - k))) & 0xFFFFFFFF

    s0 = ror(w[1], 7) ^ ror(w[1], 18) ^ (w[1] >> 3)
    s1 = ror(w[14], 17) ^ ror(w[14], 19) ^ (w[14] >> 10)
    w16 = (w[0] + s0 + w[9] + s1) & 0xFFFFFFFF
    # uint256: x = out[0..4] (128-bit — the chip shares the reference's
    # reduced-inputs quotient bound), y = out[8..16], m = w16|1 replicated
    x = sum(out[i] << (32 * i) for i in range(4))
    y = sum(out[8 + i] << (32 * i) for i in range(8))
    mword = w16 | 1
    m = sum(mword << (32 * i) for i in range(8))
    res = (x * y) % m
    res_words = [(res >> (32 * i)) & 0xFFFFFFFF for i in range(8)]
    return res_words


def _run():
    vm = VMState(make_program(assemble(_guest_src(), ROM), ROM), ROM)
    view = native.run_trace(vm)
    assert vm.halted
    return vm, view


def test_guest_semantics():
    vm, view = _run()
    res_words = _expected()
    xw = (HEAP + 1024) >> 2
    for i in range(8):
        assert vm.mem[xw + i] == res_words[i], i
    assert vm.exit_code == res_words[0] & 0xFFFF
    # every targeted precompile actually executed
    from ceno_tpu.emulator.rv32im import K
    kinds = set(int(k) for k in np.asarray(view.kind))
    for name in ("SYS_KECCAK", "SYS_SHA_EXTEND", "SYS_UINT256_MUL",
                 "SYS_COMMIT", "MUL", "REMU"):
        assert K[name] in kinds, name


def test_preflight_matches_interpreter():
    vm = VMState(make_program(assemble(_guest_src(), ROM), ROM), ROM)
    bounds, counts, steps, state = native.run_preflight(vm)
    vm2, view = _run()
    assert steps == view.n
    assert state["exit_code"] == vm2.exit_code
    kc = np.bincount(np.asarray(view.kind, np.int64), minlength=len(counts))
    np.testing.assert_array_equal(kc, counts)


@pytest.mark.slow
def test_precompile_torture_proves():
    vm = VMState(make_program(assemble(_guest_src(), ROM), ROM), ROM)
    res = run_e2e(vm, CFG, PARAMS)
    assert int(res.public_values[4]) == _expected()[0] & 0xFFFF
    assert verify(res.pk.vk, res.proof)
