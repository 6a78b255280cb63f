"""AOT preflight backend (emulator/aotgen.py — ceno_emul/src/aot.rs role):
guest basic blocks compiled to native code. Equivalence contract with the
tracing interpreter: same final machine state, same per-kind step counts
(after syscall re-kinding), and byte-identical shard boundaries vs
plan_boundaries over the real trace."""

import numpy as np
import pytest

from ceno_tpu.emulator import native, programs, rv32im
from ceno_tpu.emulator.rv32im import KINDS
from ceno_tpu.emulator.state import Platform, VMState, make_program

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="no C++ toolchain"
)


def _counts_of(view):
    return np.bincount(np.asarray(view.kind, np.int64), minlength=len(KINDS))


def _assert_equivalent(make_vm, **plan_kwargs):
    vm = make_vm()
    bounds, counts, steps, state = native.run_preflight(vm, **plan_kwargs)
    vm2 = make_vm()
    view = native.run_trace(vm2)
    assert steps == view.n
    assert state["halted"] and vm2.halted
    assert state["pc"] == vm2.pc
    assert state["cycle"] == vm2.cycle
    assert state["exit_code"] == vm2.exit_code
    np.testing.assert_array_equal(state["regs"], np.asarray(vm2.regs,
                                                            np.uint32))
    np.testing.assert_array_equal(counts, _counts_of(view))
    return view


def test_preflight_fibonacci_equivalence():
    view = _assert_equivalent(lambda: programs.fibonacci_vm(500))

    # boundary equivalence against the trace planner, cells and steps modes
    from ceno_tpu.zkvm.chips import build_all_chips
    from ceno_tpu.zkvm.shard import _cost_by_kind, plan_boundaries

    chips = build_all_chips()
    cost = _cost_by_kind(chips)
    for kwargs in ({"max_cells_per_shard": 20_000},
                   {"max_steps_per_shard": 700},
                   {"max_cells_per_shard": 50_000,
                    "max_steps_per_shard": 450}):
        want = plan_boundaries(view, chips, **kwargs)
        got, _, _, _ = native.run_preflight(
            programs.fibonacci_vm(500), cost,
            kwargs.get("max_cells_per_shard"),
            kwargs.get("max_steps_per_shard"),
        )
        assert want == got, kwargs


def test_plan_boundaries_preflight_entry_point():
    from ceno_tpu.zkvm.chips import build_all_chips
    from ceno_tpu.zkvm.shard import (
        plan_boundaries, plan_boundaries_preflight,
    )

    chips = build_all_chips()
    view = native.run_trace(programs.fibonacci_vm(300))
    want = plan_boundaries(view, chips, max_cells_per_shard=30_000)
    got = plan_boundaries_preflight(
        programs.fibonacci_vm(300), chips, max_cells_per_shard=30_000
    )
    assert want == got


def test_preflight_torture_guest_equivalence():
    """Full rv32im coverage incl. M extension, loads/stores of every width,
    jalr returns, and the keccak syscall (do_ecall is SHARED with the
    interpreter, so memory effects must match exactly)."""
    from tests.test_zkvm_extended import TORTURE

    ROM = 0x0800_0000

    def make_vm():
        src = TORTURE.format(heap=Platform.heap_start)
        return VMState(make_program(rv32im.assemble(src, ROM), ROM), ROM)

    _assert_equivalent(make_vm)


def test_preflight_memory_effects_match():
    """Keccak syscall memory writes must land identically (values, not
    timestamps — the preflight skips timestamp bookkeeping by design), and
    the ecall re-kinds to SYS_KECCAK for costs/counts."""
    from tests.test_keccak import GUEST, ROM

    def make_vm():
        return VMState(make_program(rv32im.assemble(GUEST, ROM), ROM), ROM)

    view = _assert_equivalent(make_vm)
    assert _counts_of(view)[rv32im.K["SYS_KECCAK"]] >= 1
