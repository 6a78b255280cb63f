"""End-to-end pipeline: emulate -> witgen -> prove -> verify.

Role mirror of the reference's run_e2e_with_checkpoint (e2e.rs:2035,
SURVEY.md §3.1), single-shard: run the guest on the host emulator, derive
public values, generate witness, prove on the TPU, verify on host.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..emulator.state import VMState, CYCLE_START
from .layout import (
    PV_INIT_PC, PV_END_PC, PV_INIT_CYCLE, PV_END_CYCLE,
    PV_EXIT_CODE_LO, PV_EXIT_CODE_HI, PV_HEAP_WORDS, PV_STACK_WORDS,
    PV_PUBIO_DIGEST,
    N_PUBLIC_VALUES,
)
from .tables import ZKVMConfig
from .scheme import keygen, prove, verify, ProvingKey, ZKVMProof
from ..pcs.basefold import BasefoldParams


def public_values_from_vm(vm: VMState, cfg: ZKVMConfig | None = None) -> np.ndarray:
    from .chips.dyn_ram import dyn_region_words

    cfg = cfg or ZKVMConfig(platform=vm.platform)
    pv = np.zeros(N_PUBLIC_VALUES, np.uint64)
    pv[PV_INIT_PC] = vm.entry
    pv[PV_INIT_CYCLE] = CYCLE_START
    pv[PV_END_PC] = vm.pc
    pv[PV_END_CYCLE] = vm.cycle
    pv[PV_EXIT_CODE_LO] = vm.exit_code & 0xFFFF
    pv[PV_EXIT_CODE_HI] = (vm.exit_code >> 16) & 0xFFFF
    lens = dyn_region_words(vm, cfg)
    pv[PV_HEAP_WORDS] = lens["heap"]
    pv[PV_STACK_WORDS] = lens["stack"]
    digest = vm.pubio_digest
    if digest is None:
        from ..emulator.keccak import KECCAK_EMPTY_WORDS

        digest = KECCAK_EMPTY_WORDS
    for i, w in enumerate(digest):
        pv[PV_PUBIO_DIGEST + 2 * i] = w & 0xFFFF
        pv[PV_PUBIO_DIGEST + 2 * i + 1] = (w >> 16) & 0xFFFF
    return pv


@dataclass
class E2EResult:
    pk: ProvingKey
    proof: ZKVMProof
    public_values: np.ndarray
    n_steps: int


def run_e2e(
    vm: VMState,
    cfg: ZKVMConfig | None = None,
    params: BasefoldParams | None = None,
    max_steps: int = 1 << 24,
    pk: ProvingKey | None = None,
    data_image: dict | None = None,
) -> E2EResult:
    from ..emulator import native

    trace = native.run_trace(vm, max_steps)  # native core when available
    assert vm.halted, "guest did not halt"
    pv = public_values_from_vm(vm, cfg)
    if pk is None:
        pk = keygen(vm.program, cfg, params, data_image=data_image)
    proof = prove(pk, vm, trace, pv)
    return E2EResult(pk, proof, pv, trace.n)
