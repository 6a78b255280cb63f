"""Witness generation: trace records -> per-chip trace matrices + multiplicities.

Role mirror of the reference's witgen stage (generate_witness, e2e.rs:1392 and
Instruction::assign_instances, SURVEY.md §3.1): dispatch traced steps to opcode
chips by instruction kind, fill each chip's witness matrix, count lookup
multiplicities (LkMultiplicity mirror) by evaluating every chip's lookup field
expressions over its assigned rows, then assign the table chips from the
counts + final VM state.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass

import numpy as np

from ..fields import babybear as bb
from ..gkr.mock import eval_expr_host
from ..gkr.chip import structural_table
from .chips.opcodes import ChipDef
from .tables import TableDef, WitgenCtx, ZKVMConfig


@dataclass
class AssignedChip:
    name: str
    compiled: object
    cb: object
    wit: np.ndarray          # (n_wit, N) canonical, padded to pow2
    num_instances: int
    n_rows: int              # padded height
    is_table: bool


def _pad_pow2(m: np.ndarray, k: int) -> np.ndarray:
    n = max(2, 1 << max(0, (k - 1).bit_length()))
    if m.shape[1] < n:
        m = np.pad(m, ((0, 0), (0, n - m.shape[1])))
    return m


def _lk_counts(cb, compiled, wit, instances, k, counts: dict):
    """Evaluate chip-side lookup fields over active rows; bump counters."""
    n = wit.shape[1] if wit.size else 2
    structural = (
        np.stack([structural_table(s, n) for s in compiled.structural])
        if compiled.structural
        else np.zeros((0, n), np.uint64)
    )
    fixed = np.zeros((0, n), np.uint64)  # lookups never reference fixed cols here
    memo = {}
    for tag, fields in cb.lk_fields:
        vals = []
        for f in fields:
            kind, v = eval_expr_host(f, wit, fixed, structural, instances, _MOCK_CHAL, memo)
            assert kind == "b", "lookup fields must be base-valued"
            vals.append(np.broadcast_to(np.atleast_1d(np.asarray(v, np.uint64)), (n,)))
        tagc = counts.setdefault(tag, Counter())
        stacked = np.stack(vals, axis=1)[:k]  # (k, n_fields)
        uniq, cnt = np.unique(stacked, axis=0, return_counts=True)
        for row, c in zip(uniq, cnt):
            tagc[tuple(int(x) for x in row)] += int(c)


_MOCK_CHAL = np.array([[5, 7, 11, 13], [17, 19, 23, 29]], np.uint64)


def generate_witness(
    records,
    opcode_chips: list[ChipDef],
    tables: list[TableDef],
    vm,
    instances: np.ndarray,
    cfg: ZKVMConfig,
):
    """Returns (assigned list in registry order: opcode chips then tables)."""
    from .chips.opcodes import TraceView

    view = records if isinstance(records, TraceView) else TraceView.from_records(records)
    covered = np.zeros(view.n, bool)
    assigned = []
    counts: dict = {}
    for chip in opcode_chips:
        mask = np.isin(view.kind, np.array(chip.kinds, np.int64))
        covered |= mask
        idx = np.nonzero(mask)[0]
        k = len(idx)
        wit = chip.assign(view.select(idx)) if k else np.zeros(
            (len(chip.cb.wit_names), 0), np.uint64
        )
        wit = _pad_pow2(wit, k)
        if k:
            _lk_counts(chip.cb, chip.compiled, wit, instances, k, counts)
        assigned.append(
            AssignedChip(chip.name, chip.compiled, chip.cb, wit, k, wit.shape[1], False)
        )

    assert covered.all(), (
        f"steps with no chip: kinds {set(view.kind[~covered].tolist())}"
    )

    # every touched/initialized address must be covered by a RAM table window
    from .tables import memory_windows

    windows = memory_windows(cfg)
    for waddr in set(vm.touched) | set(vm.mem_init):
        if not any(b <= waddr < b + sz for b, sz in windows):
            raise AssertionError(
                f"memory access at word {waddr:#x} outside all RAM windows "
                f"(grow mem/hints/stack window config)"
            )

    ctx = WitgenCtx(counts, vm, None, cfg)
    for t in tables:
        wit = t.assign(ctx)
        wit = _pad_pow2(wit, t.n_rows)
        assigned.append(
            AssignedChip(t.name, t.compiled, t.cb, wit, t.n_rows, wit.shape[1], True)
        )
    return assigned
