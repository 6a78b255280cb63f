"""Aggregation witness: a REAL fibonacci shard proof's tower + class-main
verification stages expressed as bus-balanced, MockProver-satisfiable chip
witness sets (RECURSION.md build order #6, first slice), and the FS-bound
aggregation (build order #6 second slice: the whole shard-verify transcript
re-proven in-circuit, challenges derived from it, aggregation proof through
the jagged-PCS chipset scheme)."""

import numpy as np
import pytest

from ceno_tpu.fields import babybear as bb
from ceno_tpu.emulator import programs
from ceno_tpu.pcs.basefold import BasefoldParams
from ceno_tpu.zkvm.aggregate import (
    build_aggregation_witness, prove_aggregation, verify_aggregation,
    AggError,
)
from ceno_tpu.zkvm.e2e import run_e2e
from ceno_tpu.zkvm.tables import ZKVMConfig
from ceno_tpu.gkr.mock import MockProver

CFG = ZKVMConfig(shl_x_bits=6, mem_words_log=7)
PARAMS = BasefoldParams(blowup_log=1, n_queries=4, stop_size=32)


@pytest.fixture(scope="module")
def fib_result():
    vm = programs.fibonacci_vm(8)
    return run_e2e(vm, CFG, PARAMS)


def _pad(wit, k):
    n = max(2, 1 << max(0, (k - 1).bit_length()))
    if wit.shape[1] < n:
        wit = np.pad(wit, ((0, 0), (0, n - wit.shape[1])))
    return wit


def test_aggregation_witness_mock_satisfied(fib_result):
    res = fib_result
    sets, summary = build_aggregation_witness(res.pk.vk, res.proof)
    assert summary["tower_groups"] >= 1
    assert summary["classes"] >= 1
    assert summary["rows"] > 100
    mp_sets = []
    for name, compiled, cb, wit in sets:
        k = wit.shape[1]
        w = _pad(wit, k)
        mp_sets.append((compiled, cb, w,
                        np.zeros((0, w.shape[1]), np.uint64), np.zeros(0), k))
    assert MockProver.assert_satisfied(mp_sets) == []

    # tamper one witness cell in the largest set: something must break
    # (a local constraint or a bus chain)
    big = max(range(len(mp_sets)), key=lambda i: mp_sets[i][2].shape[1])
    bad = mp_sets[big][2].copy()
    bad[4, 1] = (int(bad[4, 1]) + 1) % bb.P
    tampered = list(mp_sets)
    tampered[big] = (mp_sets[big][0], mp_sets[big][1], bad,
                     mp_sets[big][3], mp_sets[big][4], mp_sets[big][5])
    errs = MockProver.assert_satisfied(tampered, raise_on_error=False)
    assert errs


def _agg_pv(vk, proof):
    return np.concatenate([
        vk.digest_elems() % np.uint64(bb.P),
        np.asarray(proof.public_values, np.uint64) % np.uint64(bb.P),
    ])


def test_fs_aggregation_witness_mock_satisfied(fib_result):
    """The FS-bound aggregation witness: the ENTIRE shard-verify transcript
    (every Poseidon2 permutation) plus the tower/class-main stages, with
    every stage challenge transcript-derived — bus-balanced and satisfied."""
    res = fib_result
    sets, summary = build_aggregation_witness(res.pk.vk, res.proof, fs=True)
    names = [s[0] for s in sets]
    assert "fs_duplex" in names and "fs_pv" in names and "fs_chal" in names
    pv = _agg_pv(res.pk.vk, res.proof)
    mp_sets = []
    for name, compiled, cb, wit, fixed in sets:
        k = wit.shape[1]
        if k == 0:
            continue
        w = _pad(wit, k)
        if fixed is None:
            f = np.zeros((0, w.shape[1]), np.uint64)
        else:
            f = np.pad(np.asarray(fixed, np.uint64),
                       ((0, 0), (0, w.shape[1] - fixed.shape[1])))
        mp_sets.append((compiled, cb, w, f, pv, k))
    assert MockProver.assert_satisfied(mp_sets) == []

    # tampering ANY challenge wire must now break FS binding: flip one
    # alpha component in the merged deg-3 rounds chip
    idx = names.index("sc_rounds_d3")
    name, compiled, cb, wit, fixed = sets[idx]
    j = cb.wit_names.index("alpha_0")
    bad = [list(s) for s in mp_sets]
    for row in bad:
        if row[0] is compiled:
            w2 = row[2].copy()
            w2[j, 0] = (int(w2[j, 0]) + 1) % bb.P
            row[2] = w2
    errs = MockProver.assert_satisfied([tuple(r) for r in bad],
                                       raise_on_error=False)
    assert errs


@pytest.mark.slow
def test_fs_aggregation_prove_verify(fib_result):
    """End-to-end: prove the FS-bound aggregation witness through the
    jagged-PCS chipset scheme and verify it WITHOUT a prover-supplied key
    (the trust anchor: the verifier reconstructs the expected key from the
    vk + the proof's public geometry)."""
    res = fib_result
    key, aproof = prove_aggregation(res.pk.vk, res.proof, params=PARAMS)
    assert verify_aggregation(aproof, res.pk.vk, params=PARAMS)
    # the aggregation pv binds the shard statement
    assert np.array_equal(aproof.public_values, _agg_pv(res.pk.vk, res.proof))
    # serialization roundtrip (versioned binary format, no pickle)
    from ceno_tpu.zkvm.serialize import agg_proof_to_bytes, agg_proof_from_bytes

    blob = agg_proof_to_bytes(aproof, PARAMS)
    aproof2, params2 = agg_proof_from_bytes(blob)
    assert verify_aggregation(aproof2, res.pk.vk, params=PARAMS)
    # tamper: a public value change must be rejected
    bad = np.array(aproof.public_values, np.uint64)
    bad[len(bad) - 1] = (int(bad[-1]) + 1) % bb.P
    import dataclasses

    with pytest.raises(Exception):
        verify_aggregation(dataclasses.replace(aproof, public_values=bad),
                           res.pk.vk, params=PARAMS)


@pytest.mark.slow
def test_expected_agg_key_reconstruction(fib_result):
    """The trust anchor itself: the verifier-side key reconstruction from
    (vk, params, geometry, pv) is IDENTICAL to the prover's key — same chip
    list, same compiled constraint digests, same fixed schedule columns —
    and its digest commits the circuits AND the security params."""
    import dataclasses

    from ceno_tpu.gkr.chip import chip_digest
    from ceno_tpu.zkvm.aggregate import expected_agg_key, AggKey

    res = fib_result
    key, aproof = prove_aggregation(res.pk.vk, res.proof, params=PARAMS)
    pvs = [np.asarray(res.proof.public_values, np.uint64)]
    rkey = expected_agg_key(res.pk.vk, aproof.geometry, pvs, PARAMS)
    assert len(rkey.chips) == len(key.chips)
    for (n1, c1, _, f1), (n2, c2, _, f2) in zip(key.chips, rkey.chips):
        assert n1 == n2
        assert chip_digest(c1) == chip_digest(c2), n1
        if f1 is None:
            assert f2 is None, n1
        else:
            assert np.array_equal(np.asarray(f1, np.uint64),
                                  np.asarray(f2, np.uint64)), n1
    assert np.array_equal(key.digest_elems(), rkey.digest_elems())
    # the digest pins the security level: weakened params -> different key
    weak = AggKey(key.chips, dataclasses.replace(PARAMS, n_queries=1))
    assert not np.array_equal(weak.digest_elems(), key.digest_elems())
    # ... and the circuits: dropping one chip's fixed schedule -> different
    chips2 = list(key.chips)
    nm, cc, cbn, fx = chips2[-1]
    for i, (nm, cc, cbn, fx) in enumerate(chips2):
        if fx is not None:
            fx2 = np.asarray(fx, np.uint64).copy()
            fx2[0, 0] = (int(fx2[0, 0]) + 1) % bb.P
            chips2[i] = (nm, cc, cbn, fx2)
            break
    assert not np.array_equal(
        AggKey(chips2, PARAMS).digest_elems(), key.digest_elems())
    # lying about geometry (extra instances on some chip) changes the
    # reconstruction -> the transcript's key-digest absorb diverges and
    # verification fails
    g = aproof.geometry[0]
    bad_n = list(g.num_instances)
    bad_n[0] = max(1, bad_n[0]) * 2
    bad_geo = [dataclasses.replace(g, num_instances=bad_n)]
    with pytest.raises(Exception):
        verify_aggregation(
            dataclasses.replace(aproof, geometry=bad_geo), res.pk.vk,
            params=PARAMS)


@pytest.mark.slow
def test_chipset_aggregation_level2(fib_result):
    """Pairwise tree closure (VERDICT missing #3): an aggregation proof
    itself aggregates — verify_chipset's capture hooks feed the same
    witness builder (now with PCS query phase + claim link), the level-2
    witness is bus-balanced and satisfied, and the level-2 proof is
    ACTUALLY PROVEN through the chipset scheme and verified."""
    from ceno_tpu.zkvm.aggregate import (
        build_aggregation_witness_multi, verify_chipset, LABEL_AGG,
        prove_chipset_aggregation,
    )

    res = fib_result
    key, aproof = prove_aggregation(res.pk.vk, res.proof, params=PARAMS)
    sets, summary = build_aggregation_witness_multi(
        None, [(aproof, {})], fs=True,
        verify_fn=lambda proof, cap, t, **kw: verify_chipset(
            key, proof, capture=cap, transcript=t),
        label=LABEL_AGG, digest_len=len(key.digest_elems()),
        params=PARAMS,
    )
    assert summary["tower_groups"] >= 1 and summary["classes"] >= 1
    names = [s[0] for s in sets]
    assert "pcs_merkle_rows" in names and "cl_bl_ends" in names
    pv = np.concatenate([
        key.digest_elems() % np.uint64(bb.P),
        np.asarray(aproof.public_values, np.uint64),
    ])
    mp_sets = []
    for name, compiled, cb, wit, fixed in sets:
        k = wit.shape[1]
        if k == 0:
            continue
        w = _pad(wit, k)
        if fixed is None:
            f = np.zeros((0, w.shape[1]), np.uint64)
        else:
            f = np.pad(np.asarray(fixed, np.uint64),
                       ((0, 0), (0, w.shape[1] - fixed.shape[1])))
        mp_sets.append((compiled, cb, w, f, pv, k))
    assert MockProver.assert_satisfied(mp_sets) == []

    # PROVE the level-2 closure over two DISTINCT inner aggregations
    # (VERDICT r4 weak #6): the hints guest has data-independent control
    # flow, so two hint sets of equal length give IDENTICAL proof geometry
    # (same chips, same num_instances -> same AggKey) with different
    # witness values / public values.
    from ceno_tpu.emulator.rv32im import assemble
    from ceno_tpu.emulator.state import Platform, VMState, make_program
    from ceno_tpu.zkvm.scheme import keygen, prove, verify as shard_verify
    from ceno_tpu.zkvm.e2e import public_values_from_vm
    from ceno_tpu.emulator import native

    rom = Platform.rom_start
    src = open("examples/hints.s").read().format(
        hints=Platform.hints_start, heap=Platform.heap_start
    )
    prog = make_program(assemble(src, rom), rom)
    pk = keygen(prog, CFG, PARAMS)
    inner = []
    for hint_vals in ((3, 17, 99, 4), (3, 250, 1, 77)):
        vm = VMState(dict(prog), rom)
        for i, w in enumerate(hint_vals):
            vm.init_memory(Platform.hints_start + 4 * i, w)
        trace = native.run_trace(vm)
        pv2 = public_values_from_vm(vm, CFG)
        proof2 = prove(pk, vm, trace, pv2)
        assert shard_verify(pk.vk, proof2)
        k2, a2 = prove_aggregation(pk.vk, proof2, params=PARAMS)
        inner.append((k2, a2))
    (k_a, ap_a), (k_b, ap_b) = inner
    assert np.array_equal(k_a.digest_elems(), k_b.digest_elems()), \
        "hint guests must share aggregation-key geometry"
    assert not np.array_equal(ap_a.public_values, ap_b.public_values), \
        "inner statements must be distinct"
    okey, outer = prove_chipset_aggregation(k_a, [ap_a, ap_b], params=PARAMS)
    assert verify_chipset(okey, outer)
    # the outer pv binds the inner key digest + both inner pvs
    nd = len(k_a.digest_elems())
    assert np.array_equal(
        np.asarray(outer.public_values[:nd], np.uint64),
        k_a.digest_elems() % np.uint64(bb.P),
    )
    # KEY-LESS outer verification: the outer chip set reconstructs from the
    # inner key + public geometry (trust anchor at level 2)
    from ceno_tpu.zkvm.aggregate import verify_chipset_aggregation

    inner_pvs = [ap_a.public_values, ap_b.public_values]
    assert verify_chipset_aggregation(outer, k_a, inner_pvs, params=PARAMS)
    import dataclasses as _dc

    bad_pv = np.array(outer.public_values, np.uint64)
    bad_pv[-1] = (int(bad_pv[-1]) + 1) % bb.P
    with pytest.raises(Exception):
        verify_chipset_aggregation(
            _dc.replace(outer, public_values=bad_pv), k_a, inner_pvs,
            params=PARAMS)


@pytest.mark.slow
def test_shard_aggregation_prove_verify():
    """Multi-shard: ALL shards of a 3+-shard fibonacci run aggregate into
    ONE FS-bound proof; the aggregation verifier replays the pv-only
    chaining + EC-sum checks on the aggregation public values."""
    from ceno_tpu.emulator import programs as progs
    from ceno_tpu.zkvm.scheme import keygen
    from ceno_tpu.zkvm.shard import prove_shards
    from ceno_tpu.zkvm.aggregate import (
        prove_shard_aggregation, verify_shard_aggregation,
    )

    vm = progs.fibonacci_vm(12)
    records = vm.run()
    pk = keygen(vm.program, CFG, PARAMS)
    sproof = prove_shards(pk, vm, records, 40)
    assert sproof.n_shards >= 3
    key, aproof, n = prove_shard_aggregation(pk.vk, sproof, params=PARAMS)
    n_digest = len(pk.vk.digest_elems())
    assert verify_shard_aggregation(aproof, n, pk.vk, params=PARAMS)
    # breaking the pv chain inside the AGGREGATION pv must be rejected
    from ceno_tpu.zkvm.layout import N_PUBLIC_VALUES, PV_INIT_PC
    import dataclasses

    bad = np.array(aproof.public_values, np.uint64)
    bad[n_digest + N_PUBLIC_VALUES + PV_INIT_PC] ^= 4
    with pytest.raises(Exception):
        verify_shard_aggregation(
            dataclasses.replace(aproof, public_values=bad), n, pk.vk,
            params=PARAMS)
    # VERIFIER-SIDE halt enforcement (advisor r4 medium): a final-shard
    # geometry whose halt chip count is 0 is rejected during key
    # reconstruction — before any proof math runs
    halt_ci = next(i for i, m in enumerate(pk.vk.metas) if m.name == "halt")
    bad_geo = [dataclasses.replace(g) for g in aproof.geometry]
    bad_last = list(bad_geo[-1].num_instances)
    bad_last[halt_ci] = 0
    bad_geo[-1] = dataclasses.replace(bad_geo[-1], num_instances=bad_last)
    with pytest.raises(Exception, match="halt"):
        verify_shard_aggregation(
            dataclasses.replace(aproof, geometry=bad_geo), n, pk.vk,
            params=PARAMS)


def test_pcs_query_phase_in_circuit(fib_result):
    """The PCS query phase (VERDICT missing #1): Merkle membership, fold
    consistency, PoW, query-index sampling and the batched-claim chain are
    all chips now — corrupting ANY of them breaks a constraint or the bus,
    and MockProver names it."""
    res = fib_result
    sets, summary = build_aggregation_witness(res.pk.vk, res.proof, fs=True)
    names = [s[0] for s in sets]
    for expect in ("pcs_qidx", "pcs_fold", "pcs_merkle_rows", "pcs_qend",
                   "pcs_tail_fold", "pcs_bsum_ends", "pcs_pow",
                   "pcs_root_lk", "pcs_leaf", "pcs_comb"):
        assert expect in names, f"missing pcs chip set {expect}"
    pv = _agg_pv(res.pk.vk, res.proof)

    def mp(sets_):
        out = []
        for name, compiled, cb, wit, fixed in sets_:
            k = wit.shape[1]
            if k == 0:
                continue
            w = _pad(wit, k)
            if fixed is None:
                f = np.zeros((0, w.shape[1]), np.uint64)
            else:
                f = np.pad(np.asarray(fixed, np.uint64),
                           ((0, 0), (0, w.shape[1] - fixed.shape[1])))
            out.append((compiled, cb, w, f, pv, k))
        return out

    assert MockProver.assert_satisfied(mp(sets)) == []

    def tampered(chip_name, col_name, delta=1):
        out = []
        for name, compiled, cb, wit, fixed in sets:
            if name == chip_name:
                wit = wit.copy()
                j = cb.wit_names.index(col_name)
                wit[j, 0] = (int(wit[j, 0]) + delta) % bb.P
            out.append((name, compiled, cb, wit, fixed))
        return out

    # a Merkle sibling digest byte -> the walk's compress chain breaks
    errs = MockProver.assert_satisfied(
        mp(tampered("pcs_merkle_rows", "sib0")), raise_on_error=False)
    assert errs
    # an opened base-row value -> leaf sponge preimage vs combination breaks
    errs = MockProver.assert_satisfied(
        mp(tampered("pcs_comb", "v")), raise_on_error=False)
    assert errs
    # a forged query index bit -> decomposition / sample binding breaks
    errs = MockProver.assert_satisfied(
        mp(tampered("pcs_qidx", "b0")), raise_on_error=False)
    assert errs
    # a tail fold output -> fold equation or tail-chain breaks
    errs = MockProver.assert_satisfied(
        mp(tampered("pcs_tail_fold", "out_0")), raise_on_error=False)
    assert errs
    # the PoW sample value -> range check / slot binding breaks
    errs = MockProver.assert_satisfied(
        mp(tampered("pcs_pow", "v")), raise_on_error=False)
    assert errs


def test_claim_link_in_circuit(fib_result):
    """Record-claim -> batched-claim link (VERDICT missing #2): bc, slot
    multipliers, sel_eq, sel_v/w_chip and term scalars are all derived
    in-circuit now — forging any of them breaks a constraint or the bus."""
    res = fib_result
    sets, summary = build_aggregation_witness(res.pk.vk, res.proof, fs=True)
    names = [s[0] for s in sets]
    for expect in ("cl_bl_const", "cl_bl_ends", "cl_mult_rec", "cl_sx_sum",
                   "cl_sx_prod", "cl_sx_pub", "cl_seqd_set", "cl_seqa_set",
                   "cl_wchip", "cl_svw_partial"):
        assert expect in names, f"missing claim-link chip set {expect}"
    pv = _agg_pv(res.pk.vk, res.proof)

    def mp(sets_):
        out = []
        for name, compiled, cb, wit, fixed in sets_:
            k = wit.shape[1]
            if k == 0:
                continue
            w = _pad(wit, k)
            if fixed is None:
                f = np.zeros((0, w.shape[1]), np.uint64)
            else:
                f = np.pad(np.asarray(fixed, np.uint64),
                           ((0, 0), (0, w.shape[1] - fixed.shape[1])))
            out.append((compiled, cb, w, f, pv, k))
        return out

    assert MockProver.assert_satisfied(mp(sets)) == []

    def tampered(chip_name, col_name):
        out = []
        for name, compiled, cb, wit, fixed in sets:
            if name == chip_name:
                wit = wit.copy()
                j = cb.wit_names.index(col_name)
                wit[j, 0] = (int(wit[j, 0]) + 1) % bb.P
            out.append((name, compiled, cb, wit, fixed))
        return out

    # forging a batched claim must now break (it used to be free witness)
    for chip, colname in (("cl_bl_ends", "bc_0"), ("cl_mult_rec", "m_0"),
                          ("cl_sx_pub", "tot_0"), ("cl_seq_ends", "res_0"),
                          ("cm_chip", "bc_0"), ("cm_slot", "mult_0")):
        if chip not in names:
            continue
        errs = MockProver.assert_satisfied(mp(tampered(chip, colname)),
                                           raise_on_error=False)
        assert errs, f"tampering {chip}.{colname} went undetected"


@pytest.mark.slow
def test_ec_verify_in_circuit():
    """The EC-sum quark verification (cross-shard continuation stage) is
    chips now: present in a multi-shard aggregation witness, bus-balanced,
    and tamper-detected."""
    from ceno_tpu.emulator import programs as progs
    from ceno_tpu.zkvm.scheme import keygen
    from ceno_tpu.zkvm.shard import prove_shards
    from ceno_tpu.zkvm.aggregate import build_aggregation_witness_multi

    vm = progs.fibonacci_vm(12)
    records = vm.run()
    pk = keygen(vm.program, CFG, PARAMS)
    sproof = prove_shards(pk, vm, records, 40)
    n = len(sproof.proofs)
    specs = [(p, {"is_first": s == 0, "is_last": s == n - 1,
                  "standalone": False})
             for s, p in enumerate(sproof.proofs)]
    sets, summary = build_aggregation_witness_multi(pk.vk, specs, fs=True)
    names = [s[0] for s in sets]
    for expect in ("ecq_term2", "ecq_final", "ecq_sa_end", "ecq_byp",
                   "ecq_exp"):
        assert expect in names, f"missing EC verify chip set {expect}"
    pv = np.concatenate(
        [pk.vk.digest_elems() % np.uint64(bb.P)]
        + [np.asarray(p.public_values, np.uint64) % np.uint64(bb.P)
           for p in sproof.proofs])

    def mp(sets_):
        out = []
        for name, compiled, cb, wit, fixed in sets_:
            k = wit.shape[1]
            if k == 0:
                continue
            w = _pad(wit, k)
            if fixed is None:
                f = np.zeros((0, w.shape[1]), np.uint64)
            else:
                f = np.pad(np.asarray(fixed, np.uint64),
                           ((0, 0), (0, w.shape[1] - fixed.shape[1])))
            out.append((compiled, cb, w, f, pv, k))
        return out

    assert MockProver.assert_satisfied(mp(sets)) == []
    # forging the EC recombination must break
    for chip, colname in (("ecq_final", "fc_0"), ("ecq_sa_end", "v_0"),
                          ("ecq_term2", "al_0")):
        bad = []
        for name, compiled, cb, wit, fixed in sets:
            if name == chip:
                wit = wit.copy()
                j = cb.wit_names.index(colname)
                wit[j, 0] = (int(wit[j, 0]) + 1) % bb.P
            bad.append((name, compiled, cb, wit, fixed))
        errs = MockProver.assert_satisfied(mp(bad), raise_on_error=False)
        assert errs, f"tampering {chip}.{colname} went undetected"


def test_chain_cap_enforced():
    """An FS-bound aggregation refuses more than MAX_CHAINS (=59) proofs —
    the 60th chain's duplex slot keys would wrap mod P and alias shard 0's
    namespace; wider aggregations must use the (tested) level-2 tree path."""
    from ceno_tpu.zkvm.aggregate import (
        MAX_CHAINS, build_aggregation_witness_multi,
    )

    assert MAX_CHAINS == 59
    specs = [(None, {})] * (MAX_CHAINS + 1)
    with pytest.raises(AggError, match="tree"):
        build_aggregation_witness_multi(None, specs, fs=True)
