"""Sharding/continuations: planner, per-shard mock satisfaction, e2e stitching."""

import numpy as np
import pytest

from ceno_tpu.emulator import programs
from ceno_tpu.fields import babybear as bb
from ceno_tpu.fields import septic as S
from ceno_tpu.gkr.mock import MockProver
from ceno_tpu.pcs.basefold import BasefoldParams
from ceno_tpu.zkvm import shard as shard_mod
from ceno_tpu.zkvm.chips.opcodes import TraceView
from ceno_tpu.zkvm.layout import (
    PV_RW_SUM_IN, PV_RW_SUM_OUT, PV_END_PC, PV_SHARD_ID,
)
from ceno_tpu.zkvm.scheme import keygen, verify, ZKVMError
from ceno_tpu.zkvm.shard import plan_shards, prove_shards, verify_shards, ShardChainError
from ceno_tpu.zkvm.tables import ZKVMConfig
from ceno_tpu.zkvm.witgen import generate_witness

CFG = ZKVMConfig(shl_x_bits=6, mem_words_log=7)
PARAMS = BasefoldParams(blowup_log=1, n_queries=4, stop_size=32)


def _plan(n_iters, max_steps_per_shard):
    vm = programs.fibonacci_vm(n_iters)
    records = vm.run()
    view = TraceView.from_records(records)
    pk = keygen(vm.program, CFG, PARAMS)
    ctxs = plan_shards(view, vm, pk, CFG, max_steps_per_shard)
    return vm, view, pk, ctxs


def test_plan_tokens_cancel():
    vm, view, pk, ctxs = _plan(12, 40)
    assert len(ctxs) >= 3
    # every exported token appears exactly once as an import
    exp, imp = [], []
    for ctx in ctxs:
        for tok, sink in ((ctx.out_tokens, exp), (ctx.in_tokens, imp)):
            for i in range(tok.n):
                sink.append((int(tok.is_reg[i]), int(tok.addr[i]),
                             int(tok.value[i]), int(tok.shard[i]), int(tok.clk[i])))
    assert sorted(exp) == sorted(imp)
    assert len(exp) > 0
    # EC sums over all shards cancel to infinity
    acc = (np.zeros(7, np.uint64), np.zeros(7, np.uint64))
    for ctx in ctxs:
        for base in (PV_RW_SUM_IN, PV_RW_SUM_OUT):
            acc = S.point_add(acc, (ctx.pv[base:base + 7], ctx.pv[base + 7:base + 14]))
    assert S.is_infinity(*acc)


def test_sharded_witness_mock_satisfied():
    vm, view, pk, ctxs = _plan(12, 40)
    for ctx in ctxs:
        assigned = generate_witness(
            None, pk.opcode_chips, pk.tables, vm, ctx.pv, CFG,
            shard_ctx=ctx, shard_chips=pk.shard_chips,
            opcode_assigned=ctx.opcode_assigned,
        )
        chips = []
        for a in assigned:
            n = a.n_rows
            fixed = np.zeros((0, n), np.uint64)
            for t in pk.tables:
                if t.name == a.name and t.cb.fixed_names:
                    fx = np.asarray(t.fixed_fn(), np.uint64)
                    fixed = np.pad(fx, ((0, 0), (0, n - fx.shape[1])))
            chips.append((a.compiled, a.cb, a.wit, fixed, ctx.pv, a.num_instances))
        errs = MockProver.assert_satisfied(chips, raise_on_error=False)
        assert errs == [], (ctx.shard_id, errs[:5])


@pytest.fixture(scope="module")
def sharded_result():
    vm = programs.fibonacci_vm(12)
    records = vm.run()
    pk = keygen(vm.program, CFG, PARAMS)
    sproof = prove_shards(pk, vm, records, 40)
    return pk, sproof


def test_sharded_prove_verify(sharded_result):
    pk, sproof = sharded_result
    assert sproof.n_shards >= 3
    assert verify_shards(pk.vk, sproof)


def test_sharded_rejects_broken_pv_chain(sharded_result):
    import copy

    pk, sproof = sharded_result
    bad = copy.deepcopy(sproof)
    bad.proofs[1].public_values = bad.proofs[1].public_values.copy()
    bad.proofs[1].public_values[PV_END_PC] += 4
    with pytest.raises(Exception):
        verify_shards(pk.vk, bad)


def test_sharded_rejects_tampered_ec_sum(sharded_result):
    import copy

    pk, sproof = sharded_result
    bad = copy.deepcopy(sproof)
    pv = bad.proofs[0].public_values.copy()
    pv[PV_RW_SUM_OUT] = (int(pv[PV_RW_SUM_OUT]) + 1) % bb.P
    bad.proofs[0].public_values = pv
    with pytest.raises(Exception):
        verify_shards(pk.vk, bad)


def test_sharded_rejects_dropped_shard(sharded_result):
    import copy

    pk, sproof = sharded_result
    bad = copy.deepcopy(sproof)
    bad.proofs = bad.proofs[:-1]
    bad.n_shards -= 1
    with pytest.raises(Exception):
        verify_shards(pk.vk, bad)


def test_standalone_rejects_interior_shard(sharded_result):
    pk, sproof = sharded_result
    with pytest.raises(ZKVMError):
        verify(pk.vk, sproof.proofs[1])


def test_cost_model_planner_weighs_keccak():
    from ceno_tpu.emulator.rv32im import assemble
    from ceno_tpu.emulator.state import VMState, make_program, Platform
    from ceno_tpu.zkvm.shard import plan_boundaries
    from ceno_tpu.zkvm.chips import build_all_chips

    ROM, HEAP = Platform.rom_start, Platform.heap_start
    src = f"""
        li t1, {HEAP}
        li t0, {Platform.ECALL_KECCAK}
        mv a0, t1
        ecall
        li t0, 0
        li a0, 0
        ecall
    """
    vm = VMState(make_program(assemble(src, ROM), ROM), ROM)
    records = vm.run()
    view = TraceView.from_records(records)
    chips = build_all_chips()
    # a cell budget well below the keccak step cost forces it into its own
    # shard; cheap steps batch together
    bounds = plan_boundaries(view, chips, max_cells_per_shard=2000)
    sizes = [b - a for a, b in zip(bounds[:-1], bounds[1:])]
    assert len(sizes) >= 2
    kk = [i for i in range(view.n) if view.sys_idx[i] >= 0][0]
    shard_of_kk = next(
        s for s, (a, b) in enumerate(zip(bounds[:-1], bounds[1:])) if a <= kk < b
    )
    assert bounds[shard_of_kk + 1] - bounds[shard_of_kk] == 1, (
        "keccak step should be alone in its shard under a small cell budget"
    )


@pytest.mark.slow
def test_sharded_keccak_guest_proves():
    from ceno_tpu.emulator.rv32im import assemble
    from ceno_tpu.emulator.state import VMState, make_program, Platform

    ROM, HEAP = Platform.rom_start, Platform.heap_start
    src = f"""
        li t1, {HEAP}
        li a1, 9
        sw a1, 0(t1)
        li t0, {Platform.ECALL_KECCAK}
        mv a0, t1
        ecall
        lw a2, 0(t1)
        li t0, 0
        li a0, 0
        ecall
    """
    vm = VMState(make_program(assemble(src, ROM), ROM), ROM)
    records = vm.run()
    pk = keygen(vm.program, CFG, PARAMS)
    sproof = prove_shards(pk, vm, records, max_cells_per_shard=20000)
    assert sproof.n_shards >= 2
    assert verify_shards(pk.vk, sproof)


@pytest.mark.slow
def test_pipelined_matches_sequential(sharded_result):
    """P4 pipeline (witgen thread overlapping device prove) is transcript-
    neutral: proofs are identical to the sequential path."""
    pk, sproof = sharded_result
    vm = programs.fibonacci_vm(12)
    records = vm.run()
    seq = prove_shards(pk, vm, records, 40, pipeline=False)
    assert seq.n_shards == sproof.n_shards
    from ceno_tpu.zkvm.serialize import proof_to_bytes

    for a, b in zip(sproof.proofs, seq.proofs):
        ba = proof_to_bytes(a, a.public_values, CFG, PARAMS)
        bb_ = proof_to_bytes(b, b.public_values, CFG, PARAMS)
        assert ba == bb_
