"""Full zkVM e2e: emulate -> prove -> verify (CPU backend, small params)."""

import numpy as np
import pytest

from ceno_tpu.emulator import programs
from ceno_tpu.pcs.basefold import BasefoldParams
from ceno_tpu.zkvm.e2e import run_e2e
from ceno_tpu.zkvm.scheme import verify, ZKVMError
from ceno_tpu.zkvm.tables import ZKVMConfig

CFG = ZKVMConfig(shl_x_bits=6, mem_words_log=7)
PARAMS = BasefoldParams(blowup_log=1, n_queries=4, stop_size=32)


@pytest.fixture(scope="module")
def fib_result():
    vm = programs.fibonacci_vm(8)
    return run_e2e(vm, CFG, PARAMS)


def test_fibonacci_proves_and_verifies(fib_result):
    res = fib_result
    assert verify(res.pk.vk, res.proof)


def test_tampered_public_values_rejected(fib_result):
    res = fib_result
    import copy

    bad = copy.deepcopy(res.proof)
    bad.public_values = bad.public_values.copy()
    bad.public_values[4] += 1  # exit code lo
    with pytest.raises(Exception):
        verify(res.pk.vk, bad)


def test_tampered_chip_proof_rejected(fib_result):
    res = fib_result
    import copy

    bad = copy.deepcopy(res.proof)
    # corrupt a tower out eval of the first group with product specs
    for gp in bad.tower_groups.values():
        if gp.prod_out.shape[0]:
            gp.prod_out[0][0][0] = (int(gp.prod_out[0][0][0]) + 1) % 2013265921
            break
    with pytest.raises(Exception):
        verify(res.pk.vk, bad)


def test_tampered_class_main_rejected(fib_result):
    res = fib_result
    import copy

    bad = copy.deepcopy(res.proof)
    # corrupt one round message of the largest class's batched main zerocheck
    h = max(bad.class_main)
    msgs = bad.class_main[h].main_msgs
    msgs[0][0][0] = (int(msgs[0][0][0]) + 1) % 2013265921
    with pytest.raises(Exception):
        verify(res.pk.vk, bad)


def test_tampered_class_eval_rejected(fib_result):
    res = fib_result
    import copy

    bad = copy.deepcopy(res.proof)
    # shift one chip's claimed witness-column eval in the class main proof
    h = max(bad.class_main)
    for we in bad.class_main[h].wit_evals:
        if we.shape[0]:
            we[0][0] = (int(we[0][0]) + 1) % 2013265921
            break
    with pytest.raises(Exception):
        verify(res.pk.vk, bad)


def test_jagged_single_commitment(fib_result):
    """Jagged PCS (the default): ONE witness commitment/opening for the
    whole shard, opened at a single point."""
    res = fib_result
    assert len(res.proof.witness_roots) == 1
    assert len(res.proof.witness_openings) == 1
    (op,) = res.proof.witness_openings.values()
    assert op.opening.point_evals.shape[0] == 1


def test_class_pcs_mode_still_works():
    """PcsKind::Basefold analog: per-height-class commitments, one main
    point per class."""
    params = BasefoldParams(blowup_log=1, n_queries=4, stop_size=32,
                            jagged=False)
    vm = programs.fibonacci_vm(8)
    res = run_e2e(vm, CFG, params)
    assert verify(res.pk.vk, res.proof)
    assert len(res.proof.witness_roots) > 1
    for h, op in res.proof.witness_openings.items():
        assert op.point_evals.shape[0] == 1


def test_memsum_proves_and_verifies():
    vm = programs.memsum_vm(5)
    res = run_e2e(vm, CFG, PARAMS)
    assert verify(res.pk.vk, res.proof)


def test_hinted_fibonacci_proves_and_verifies():
    from ceno_tpu.emulator.programs import fibonacci_hinted_vm, fib_expected

    vm = fibonacci_hinted_vm(9)
    res = run_e2e(vm, CFG, PARAMS)
    assert int(res.public_values[4]) == fib_expected(9) & 0xFFFF
    assert verify(res.pk.vk, res.proof)


@pytest.mark.slow
def test_example_guests_prove():
    """The examples/ guests (reference examples mirror) prove end-to-end."""
    from ceno_tpu.emulator.rv32im import assemble
    from ceno_tpu.emulator.state import VMState, make_program, Platform

    rom = Platform.rom_start
    # quadratic sorting over 6 hint words
    src = open("examples/quadratic_sorting.s").read().format(
        hints=Platform.hints_start, heap=Platform.heap_start
    )
    vm = VMState(make_program(assemble(src, rom), rom), rom)
    data = [6, 30, 5, 12, 9, 44, 1]  # n followed by values
    for i, w in enumerate(data):
        vm.init_memory(Platform.hints_start + 4 * i, w)
    res = run_e2e(vm, CFG, PARAMS)
    vals = sorted(data[1:])
    expect = sum(i * v for i, v in enumerate(vals)) & 0xFFFF
    assert int(res.public_values[4]) == expect
    assert verify(res.pk.vk, res.proof)

    # is_prime
    src = open("examples/is_prime.s").read().format(
        hints=Platform.hints_start, heap=Platform.heap_start
    )
    for n, prime in ((97, 1), (91, 0)):
        vm = VMState(make_program(assemble(src, rom), rom), rom)
        vm.init_memory(Platform.hints_start, n)
        res = run_e2e(vm, CFG, PARAMS)
        assert int(res.public_values[4]) == prime, n
        assert verify(res.pk.vk, res.proof)

    # median (examples/median.rs role)
    src = open("examples/median.s").read().format(
        hints=Platform.hints_start, heap=Platform.heap_start
    )
    vm = VMState(make_program(assemble(src, rom), rom), rom)
    data = [5, 40, 7, 23, 90, 11]
    for i, w in enumerate(data):
        vm.init_memory(Platform.hints_start + 4 * i, w)
    res = run_e2e(vm, CFG, PARAMS)
    assert int(res.public_values[4]) == sorted(data[1:])[2]
    assert verify(res.pk.vk, res.proof)

    # hints (examples/hints.rs role): M-extension checksum of hint words
    src = open("examples/hints.s").read().format(
        hints=Platform.hints_start, heap=Platform.heap_start
    )
    vm = VMState(make_program(assemble(src, rom), rom), rom)
    data = [5, 123, 9, 77, 65535, 4]
    for i, w in enumerate(data):
        vm.init_memory(Platform.hints_start + 4 * i, w)
    res = run_e2e(vm, CFG, PARAMS)
    acc = 0
    for v in data[1:]:
        acc = (acc * 31 + v) % 65521
    assert int(res.public_values[4]) == acc & 0xFFFF
    assert verify(res.pk.vk, res.proof)

    # ceno_rt_mem (examples/ceno_rt_mem.rs role): dynamic heap sweep
    src = open("examples/ceno_rt_mem.s").read().format(
        hints=Platform.hints_start, heap=Platform.heap_start
    )
    vm = VMState(make_program(assemble(src, rom), rom), rom)
    n = 7
    vm.init_memory(Platform.hints_start, n)
    res = run_e2e(vm, CFG, PARAMS)
    acc = 0
    for i in reversed(range(n)):
        v = 8 * i + 3
        acc = ((acc ^ v) + v) & 0xFFFF
    assert int(res.public_values[4]) == acc
    assert verify(res.pk.vk, res.proof)


@pytest.mark.slow
def test_hashing_guest_commits_digest():
    """examples/hashing.s: keccak syscall + PUB_IO commit of the state."""
    from ceno_tpu.emulator.rv32im import assemble
    from ceno_tpu.emulator.state import VMState, make_program, Platform
    from ceno_tpu.emulator.keccak import keccakf, words_to_lanes, lanes_to_words
    from ceno_tpu.zkvm.layout import PV_PUBIO_DIGEST

    rom = Platform.rom_start
    src = open("examples/hashing.s").read().format(
        hints=Platform.hints_start, heap=Platform.heap_start,
        keccak=Platform.ECALL_KECCAK, commit=Platform.ECALL_COMMIT,
    )
    vm = VMState(make_program(assemble(src, rom), rom), rom)
    seed = [4, 0xDEAD, 0xBEEF, 0x1234, 0x5678]
    for i, w in enumerate(seed):
        vm.init_memory(Platform.hints_start + 4 * i, w)
    res = run_e2e(vm, CFG, PARAMS)
    state = seed[1:] + [0] * 46
    expect = lanes_to_words(keccakf(words_to_lanes(state)))[:8]
    # PV carries the committed digest words as u16 limb pairs
    pv = [int(x) for x in
          res.public_values[PV_PUBIO_DIGEST : PV_PUBIO_DIGEST + 16]]
    got = [pv[2 * i] | (pv[2 * i + 1] << 16) for i in range(8)]
    assert got == expect
    assert verify(res.pk.vk, res.proof)


def test_checkpointed_pipeline():
    """Checkpoint staging (run_e2e_with_checkpoint mirror): stop after
    keygen, resume through emulation, proving, and verification."""
    from ceno_tpu.zkvm.e2e import Checkpoint, run_e2e_with_checkpoint

    vm = programs.fibonacci_vm(8)
    st = run_e2e_with_checkpoint(vm, CFG, PARAMS,
                                 checkpoint=Checkpoint.PREP_E2E_PROVING)
    assert st.pk is not None and st.trace is None
    st = st.resume(Checkpoint.PREP_WITNESS_GEN)
    assert st.trace is not None and st.proof is None
    st = st.resume(Checkpoint.PREP_VERIFY)
    assert st.proof is not None and not st.verified
    st = st.resume()
    assert st.verified
