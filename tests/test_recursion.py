"""Recursive-verifier chips: the sumcheck-verify rounds chip + endpoints
chip verify REAL sumcheck transcripts in-circuit (RECURSION.md #2) —
MockProver satisfaction, bus balance, and full prove/verify."""

import numpy as np
import jax.numpy as jnp

from ceno_tpu.fields import babybear as bb
from ceno_tpu.fields import ext4_host as exth
from ceno_tpu.gkr import recursion as R
from ceno_tpu.gkr.chip import prove_chip, verify_chip
from ceno_tpu.gkr.mock import MockProver
from ceno_tpu.hash.transcript import Transcript
from ceno_tpu.sumcheck import prover as sc_prover
from ceno_tpu.sumcheck.prover import TermSpec

rng = np.random.default_rng(23)
N_VARS, DEG = 4, 3


def _real_transcripts(m):
    """Run m real host sumchecks; return their verifier-side artifacts."""
    out = []
    for i in range(m):
        n = 1 << N_VARS
        f = rng.integers(0, bb.P, size=n, dtype=np.uint64)
        g = rng.integers(0, bb.P, size=(n, 4), dtype=np.uint64)
        h = rng.integers(0, bb.P, size=(n, 4), dtype=np.uint64)
        scalar = rng.integers(0, bb.P, size=4, dtype=np.uint64)
        acc = np.zeros(4, np.uint64)
        for j in range(n):
            acc = exth.add(
                acc, exth.mul_base(exth.mul(g[j], h[j]), np.uint64(f[j]))
            )
        claim = exth.mul(scalar, acc)
        tp = Transcript(b"rec-test-%d" % i)
        res = sc_prover.prove(
            [f], [g, h], [TermSpec(scalar, bidx=(0,), eidx=(0, 1))],
            N_VARS, tp,
        )
        # chals in round order (res.point is LSB-first = reversed rounds)
        chals = res.point[::-1].copy()
        out.append({"msgs": res.proof.round_msgs, "chals": chals,
                    "claim": claim})
    return out


def _pad(wit, k):
    n = max(2, 1 << max(0, (k - 1).bit_length()))
    if wit.shape[1] < n:
        wit = np.pad(wit, ((0, 0), (0, n - wit.shape[1])))
    return wit


def test_sumcheck_verify_chips_mock_and_tamper():
    chips = R.build_sumcheck_verify_chips(DEG, N_VARS)
    trs = _real_transcripts(3)
    rounds_wit, ends_wit, _ = R.assign_sumcheck_verify(chips, trs)
    kr, ke = rounds_wit.shape[1], ends_wit.shape[1]
    rw = _pad(rounds_wit, kr)
    ew = _pad(ends_wit, ke)
    sets = [
        (chips.rounds_compiled, chips.rounds_cb, rw,
         np.zeros((0, rw.shape[1]), np.uint64), np.zeros(0), kr),
        (chips.ends_compiled, chips.ends_cb, ew,
         np.zeros((0, ew.shape[1]), np.uint64), np.zeros(0), ke),
    ]
    assert MockProver.assert_satisfied(sets) == []

    # tampering one round message must break either the local Lagrange
    # equation or the bus chain
    bad = rw.copy()
    yi = chips.rounds_cb.wit_names.index("y2_1")
    bad[yi, 5] = (int(bad[yi, 5]) + 1) % bb.P
    sets_bad = [
        (chips.rounds_compiled, chips.rounds_cb, bad,
         np.zeros((0, rw.shape[1]), np.uint64), np.zeros(0), kr),
        sets[1],
    ]
    errs = MockProver.assert_satisfied(sets_bad, raise_on_error=False)
    assert errs


def test_sumcheck_verify_chips_prove_and_verify():
    chips = R.build_sumcheck_verify_chips(DEG, N_VARS)
    trs = _real_transcripts(2)
    rounds_wit, ends_wit, final_claims = R.assign_sumcheck_verify(chips, trs)
    kr, ke = rounds_wit.shape[1], ends_wit.shape[1]
    rw = _pad(rounds_wit, kr)
    ew = _pad(ends_wit, ke)
    challenges = rng.integers(1, bb.P, size=(2, 4), dtype=np.uint64)

    def dev(x):
        return jnp.asarray(
            bb.np_to_monty(np.asarray(x, np.uint64).astype(np.uint32))
        )

    tp = Transcript(b"rec-prove")
    proofs = []
    for compiled, wit, k in (
        (chips.rounds_compiled, rw, kr), (chips.ends_compiled, ew, ke),
    ):
        n = wit.shape[1]
        proof, opening = prove_chip(
            compiled, dev(wit), dev(np.zeros((0, n), np.uint64)),
            dev(np.zeros((0, n), np.uint64)), np.zeros(0), k, challenges, tp,
        )
        proofs.append(proof)

    tv = Transcript(b"rec-prove")
    prod_r = exth.one()
    prod_w = exth.one()
    for compiled, proof in (
        (chips.rounds_compiled, proofs[0]), (chips.ends_compiled, proofs[1]),
    ):
        opening, prod_values, _ = verify_chip(
            compiled, proof, np.zeros(0), challenges, tv
        )
        prod_r = exth.mul(prod_r, prod_values[0])
        prod_w = exth.mul(prod_w, prod_values[1])
    # the claim-chain bus must balance across the two chips
    assert np.array_equal(prod_r, prod_w)

    # the endpoints chip pins the real final claims
    fc = np.asarray(final_claims, np.uint64)
    base = chips.ends_cb.wit_names.index("final_claim_0")
    assert np.array_equal(ew[base : base + 4, :2].T, fc)


def test_fs_sumcheck_verify_full_fiat_shamir():
    """The FS chips verify a REAL transcript-driven sumcheck end-to-end: the
    in-circuit duplex must reproduce the live Transcript's challenges, the
    claim chain must close, and tampering a message must break a row."""
    from ceno_tpu.gkr.recursion import (
        build_fs_sumcheck_verify_chips, assign_fs_sumcheck_verify,
    )

    chips = build_fs_sumcheck_verify_chips(DEG, N_VARS)
    # a real sumcheck driven by a real Transcript whose state at round 0
    # has the canonical pos=8 shape (fresh transcript = label digest absorb)
    n = 1 << N_VARS
    f = rng.integers(0, bb.P, size=n, dtype=np.uint64)
    g = rng.integers(0, bb.P, size=(n, 4), dtype=np.uint64)
    h = rng.integers(0, bb.P, size=(n, 4), dtype=np.uint64)
    scalar = rng.integers(0, bb.P, size=4, dtype=np.uint64)
    acc = np.zeros(4, np.uint64)
    for j in range(n):
        acc = exth.add(acc, exth.mul_base(exth.mul(g[j], h[j]), np.uint64(f[j])))
    claim = exth.mul(scalar, acc)
    tp = Transcript(b"fs-rec")
    pre_state = tp.state.copy()  # pos == 8 (label digest), pre-flush
    res = sc_prover.prove(
        [f], [g, h], [TermSpec(scalar, bidx=(0,), eidx=(0, 1))], N_VARS, tp
    )
    trs = [{"msgs": res.proof.round_msgs, "claim": claim,
            "pre_state": pre_state}]
    rw, ew, final_claims, final_states = assign_fs_sumcheck_verify(chips, trs)
    # the in-circuit duplex reproduced the live transcript's challenges:
    # the final reduced claim equals scalar * f(pt) * g(pt) * h(pt)
    expect = exth.mul(scalar, exth.mul_base(
        exth.mul(res.final_ext[0], res.final_ext[1]),
        # final_base[0] is (4,) ext form of the base col eval
        np.uint64(1),
    ))
    expect = exth.mul(expect, res.final_base[0])
    assert np.array_equal(final_claims[0], expect)

    kr, ke = rw.shape[1], ew.shape[1]
    rwp, ewp = _pad(rw, kr), _pad(ew, ke)
    sets = [
        (chips.rounds_compiled, chips.rounds_cb, rwp,
         np.zeros((0, rwp.shape[1]), np.uint64), np.zeros(0), kr),
        (chips.ends_compiled, chips.ends_cb, ewp,
         np.zeros((0, ewp.shape[1]), np.uint64), np.zeros(0), ke),
    ]
    assert MockProver.assert_satisfied(sets) == []

    # tamper one message element: the duplex output diverges -> some
    # constraint or the bus chain must break
    bad = rwp.copy()
    yi = chips.rounds_cb.wit_names.index("y1_2")
    bad[yi, 1] = (int(bad[yi, 1]) + 1) % bb.P
    errs = MockProver.assert_satisfied(
        [(chips.rounds_compiled, chips.rounds_cb, bad,
          np.zeros((0, rwp.shape[1]), np.uint64), np.zeros(0), kr), sets[1]],
        raise_on_error=False,
    )
    assert errs


def test_merkle_path_chips_verify_real_paths():
    """Merkle-path chips verify REAL basefold Merkle tree openings
    in-circuit (RECURSION.md #4)."""
    from ceno_tpu.gkr.recursion import (
        build_merkle_path_chips, assign_merkle_paths,
    )
    from ceno_tpu.pcs.merkle import MerkleTree, verify_path
    from ceno_tpu.hash import poseidon2 as p2

    depth = 5
    n_leaves = 1 << depth
    cols = rng.integers(0, bb.P, size=(3, n_leaves), dtype=np.uint64)
    tree = MerkleTree.build_host(cols)
    chips = build_merkle_path_chips(depth)
    walks = []
    for ix in (0, 7, 31):
        path = tree.open_paths([ix])[0]  # (depth, 8)
        assert verify_path(tree.root, ix, cols[:, ix], path)
        leaf = p2.hash_elements_host(cols[:, ix])
        walks.append({"index": ix, "leaf": leaf, "path": path})
    rw, ew, roots = assign_merkle_paths(chips, walks)
    # every walk must land on the tree root
    for i in range(len(walks)):
        assert np.array_equal(roots[i], tree.root)
    kr, ke = rw.shape[1], ew.shape[1]
    rwp, ewp = _pad(rw, kr), _pad(ew, ke)
    sets = [
        (chips.rows_compiled, chips.rows_cb, rwp,
         np.zeros((0, rwp.shape[1]), np.uint64), np.zeros(0), kr),
        (chips.ends_compiled, chips.ends_cb, ewp,
         np.zeros((0, ewp.shape[1]), np.uint64), np.zeros(0), ke),
    ]
    assert MockProver.assert_satisfied(sets) == []
    # tamper one sibling: the compression chain must break
    bad = rwp.copy()
    si = chips.rows_cb.wit_names.index("sib3")
    bad[si, 2] = (int(bad[si, 2]) + 1) % bb.P
    errs = MockProver.assert_satisfied(
        [(chips.rows_compiled, chips.rows_cb, bad,
          np.zeros((0, rwp.shape[1]), np.uint64), np.zeros(0), kr), sets[1]],
        raise_on_error=False,
    )
    assert errs


def test_tower_verify_chips_real_tower():
    """Tower recombination chips (RECURSION.md #5) verify a REAL tower proof
    in-circuit: per-level sumchecks via the rounds chip, level boundaries via
    the boundary chip, endpoints pinned by the ends chip — bus-balanced and
    MockProver-satisfied; tampering an eval breaks it."""
    from ceno_tpu.gkr import tower

    n_vars, s_p, s_l = 4, 2, 1
    n = 1 << n_vars
    prods = [
        rng.integers(1, bb.P, size=(n, 4), dtype=np.uint64) for _ in range(s_p)
    ]
    logups = [
        (rng.integers(0, bb.P, size=(n, 4), dtype=np.uint64),
         rng.integers(1, bb.P, size=(n, 4), dtype=np.uint64))
        for _ in range(s_l)
    ]
    tp = Transcript(b"tower-rec")
    proof, _pt, (prod_claims, logup_claims) = tower.prove_towers_host(
        prods, logups, tp
    )

    chips = R.build_tower_verify_chips(s_p, s_l, n_vars)
    tv = Transcript(b"tower-rec")
    rw, bw, qw, ew, rec_claims = R.assign_tower_verify(chips, [proof], tv)
    # the ends chip read back the true record-MLE claims
    assert np.array_equal(rec_claims[0, :s_p], prod_claims)
    assert np.array_equal(rec_claims[0, s_p], logup_claims[0][0])
    assert np.array_equal(rec_claims[0, s_p + 1], logup_claims[0][1])

    kr, kb, kq, ke = rw.shape[1], bw.shape[1], qw.shape[1], ew.shape[1]
    rwp, bwp, qwp, ewp = _pad(rw, kr), _pad(bw, kb), _pad(qw, kq), _pad(ew, ke)
    sets = [
        (chips.rounds_compiled, chips.rounds_cb, rwp,
         np.zeros((0, rwp.shape[1]), np.uint64), np.zeros(0), kr),
        (chips.bound_compiled, chips.bound_cb, bwp,
         np.zeros((0, bwp.shape[1]), np.uint64), np.zeros(0), kb),
        (chips.eqrows_compiled, chips.eqrows_cb, qwp,
         np.zeros((0, qwp.shape[1]), np.uint64), np.zeros(0), kq),
        (chips.ends_compiled, chips.ends_cb, ewp,
         np.zeros((0, ewp.shape[1]), np.uint64), np.zeros(0), ke),
    ]
    from ceno_tpu.gkr.mock import MockProver as MP
    assert MP.assert_satisfied(sets) == []

    # tamper one level eval: recombination or the claim-chain bus must break
    bad = bwp.copy()
    ei = chips.bound_cb.wit_names.index("ev1_2")
    bad[ei, 1] = (int(bad[ei, 1]) + 1) % bb.P
    errs = MP.assert_satisfied(
        [sets[0],
         (chips.bound_compiled, chips.bound_cb, bad,
          np.zeros((0, bwp.shape[1]), np.uint64), np.zeros(0), kb),
         sets[2], sets[3]],
        raise_on_error=False,
    )
    assert errs

    # tamper the claimed total product (layer-1 out): the initial claim
    # chain written by the ends chip must no longer balance
    bad_e = ewp.copy()
    oi = chips.ends_cb.wit_names.index("po01_0")
    bad_e[oi, 0] = (int(bad_e[oi, 0]) + 1) % bb.P
    errs2 = MP.assert_satisfied(
        [sets[0], sets[1], sets[2],
         (chips.ends_compiled, chips.ends_cb, bad_e,
          np.zeros((0, ewp.shape[1]), np.uint64), np.zeros(0), ke)],
        raise_on_error=False,
    )
    assert errs2


def test_jagged_verify_chips_real_opening():
    """Jagged-weight recombination chips (RECURSION.md #5) verify a REAL
    jagged opening's translation argument in-circuit: the eq1-chain rows,
    per-claim gamma-weighted sums, and the final chip's binding to the
    deg-2 translation sumcheck (proved by the standard rounds chip) — all
    bus-balanced; tampering a claimed value breaks it."""
    from ceno_tpu.pcs import basefold, jagged
    from ceno_tpu.pcs.basefold import BasefoldParams
    from ceno_tpu.sumcheck import host_impl as H
    from ceno_tpu.gkr.mock import MockProver as MP

    params = BasefoldParams(blowup_log=1, n_queries=4, stop_size=32)

    def mle_eval(col, z):
        eq = H.build_eq_host(np.asarray(z, np.uint64))
        acc = np.zeros(4, np.uint64)
        for i in range(len(col)):
            acc = exth.add(acc, exth.mul_base(eq[i], np.uint64(col[i])))
        return acc

    classes = [(8, 5), (32, 3)]
    layout = jagged.plan_layout(classes)
    arrs = [
        (8, rng.integers(0, bb.P, size=(5, 8)).astype(np.uint64)),
        (32, rng.integers(0, bb.P, size=(3, 32)).astype(np.uint64)),
    ]
    mat = jagged.stack_matrix(layout, arrs)
    committed = basefold.commit(mat, params)
    z8 = rng.integers(0, bb.P, size=(3, 4)).astype(np.uint64)
    z32 = rng.integers(0, bb.P, size=(5, 4)).astype(np.uint64)
    claims = [jagged.JaggedClaim(j, z8, mle_eval(arrs[0][1][j], z8))
              for j in range(5)]
    claims += [jagged.JaggedClaim(5 + j, z32, mle_eval(arrs[1][1][j], z32))
               for j in range(3)]
    tp = Transcript(b"jagged-rec")
    proof = jagged.open_jagged(committed, layout, claims, tp, params)

    log_r = layout.n_r.bit_length() - 1
    chips = R.build_jagged_verify_chips(log_r, len(claims))
    sc2 = R.build_sumcheck_verify_chips(2, log_r)
    tv = Transcript(b"jagged-rec")
    rows_wit, claims_wit, final_wit, sc_cols = R.assign_jagged_verify(
        chips, layout, claims, proof, tv
    )
    n_sc = log_r
    sc_wit = np.zeros((len(sc2.rounds_cb.wit_names), n_sc), np.uint64)
    for j, name in enumerate(sc2.rounds_cb.wit_names):
        sc_wit[j] = np.asarray(sc_cols[name], np.uint64) % np.uint64(bb.P)

    def mkset(compiled, cb, wit):
        k = wit.shape[1]
        w = _pad(wit, k)
        return (compiled, cb, w, np.zeros((0, w.shape[1]), np.uint64),
                np.zeros(0), k)

    sets = [
        mkset(chips.rows_compiled, chips.rows_cb, rows_wit),
        mkset(chips.claims_compiled, chips.claims_cb, claims_wit),
        mkset(chips.final_compiled, chips.final_cb, final_wit),
        mkset(sc2.rounds_compiled, sc2.rounds_cb, sc_wit),
    ]
    assert MP.assert_satisfied(sets) == []

    # tamper a claimed opening value: the BSum chain or the translation
    # equality must break
    bad = sets[1][2].copy()
    vi = chips.claims_cb.wit_names.index("value_1")
    bad[vi, 3] = (int(bad[vi, 3]) + 1) % bb.P
    errs = MP.assert_satisfied(
        [sets[0], (chips.claims_compiled, chips.claims_cb, bad,
                   sets[1][3], sets[1][4], sets[1][5]), sets[2], sets[3]],
        raise_on_error=False,
    )
    assert errs

    # tamper a weight-chain z coordinate: the eq chain must diverge
    bad_r = sets[0][2].copy()
    zi = chips.rows_cb.wit_names.index("z_0")
    bad_r[zi, 4] = (int(bad_r[zi, 4]) + 1) % bb.P
    errs2 = MP.assert_satisfied(
        [(chips.rows_compiled, chips.rows_cb, bad_r,
          sets[0][3], sets[0][4], sets[0][5]), sets[1], sets[2], sets[3]],
        raise_on_error=False,
    )
    assert errs2


def test_class_main_verify_chips_real_class():
    """Class-main recombination chips (RECURSION.md #5) verify a REAL
    class-batched main zerocheck in-circuit: generic term-product / slot /
    chip / class chains with the geometry enforced by bus balance, the
    final chip binding the class total to the class sumcheck's claim chain
    (proved on the standard rounds chip)."""
    from ceno_tpu.gkr.chip import (
        build_tower_inputs, prove_group_towers, prove_class_main,
        verify_group_towers,
    )
    from ceno_tpu.gkr.mock import MockProver as MP

    # two real chips of the same height class: sumcheck-verify rounds chips
    # over two independent live sumchecks
    sc_chips = R.build_sumcheck_verify_chips(DEG, N_VARS)
    challenges = rng.integers(1, bb.P, size=(2, 4), dtype=np.uint64)
    wits = []
    for seed in (0, 1):
        trs = _real_transcripts(1)
        rw, _, _ = R.assign_sumcheck_verify(sc_chips, trs)
        wits.append(_pad(rw, rw.shape[1]))
    n = wits[0].shape[1]
    assert n == wits[1].shape[1]
    n_vars = n.bit_length() - 1
    compiled = sc_chips.rounds_compiled
    zeros = np.zeros((0, n), np.uint64)

    tp = Transcript(b"cm-rec")
    inputs = [
        build_tower_inputs(compiled, w, zeros, zeros, np.zeros(0),
                           w.shape[1], challenges)
        for w in wits
    ]
    tower_proof, ctxs = prove_group_towers(inputs, tp)
    class_proof, _opens = prove_class_main(ctxs, np.zeros(0), challenges, tp)

    tv = Transcript(b"cm-rec")
    entries = [(compiled, w.shape[1], n_vars) for w in wits]
    results = verify_group_towers(entries, tower_proof, np.zeros(0),
                                  challenges, tv)
    vctxs = [r[0] for r in results]

    cm = R.build_class_main_verify_chips()
    pw, tw, sw, cw, fw, sc_cols, deg = R.assign_class_main_verify(
        cm, vctxs, class_proof, np.zeros(0), challenges, tv
    )
    sc2 = R.build_sumcheck_verify_chips(deg, n_vars)
    sc_wit = np.zeros((len(sc2.rounds_cb.wit_names), n_vars), np.uint64)
    for j, name in enumerate(sc2.rounds_cb.wit_names):
        sc_wit[j] = np.asarray(sc_cols[name], np.uint64) % np.uint64(bb.P)

    def mkset(compiled_, cb, wit):
        k = wit.shape[1]
        w = _pad(wit, k)
        return (compiled_, cb, w, np.zeros((0, w.shape[1]), np.uint64),
                np.zeros(0), k)

    sets = [
        mkset(cm.prod_compiled, cm.prod_cb, pw),
        mkset(cm.term_compiled, cm.term_cb, tw),
        mkset(cm.slot_compiled, cm.slot_cb, sw),
        mkset(cm.chip_compiled, cm.chip_cb, cw),
        mkset(cm.final_compiled, cm.final_cb, fw),
        mkset(sc2.rounds_compiled, sc2.rounds_cb, sc_wit),
    ]
    assert MP.assert_satisfied(sets) == []

    # tamper one column eval in the term-product chain: some chain breaks
    bad = sets[0][2].copy()
    ci = cm.prod_cb.wit_names.index("c_2")
    bad[ci, 1] = (int(bad[ci, 1]) + 1) % bb.P
    errs = MP.assert_satisfied(
        [(cm.prod_compiled, cm.prod_cb, bad, sets[0][3], sets[0][4],
          sets[0][5])] + sets[1:],
        raise_on_error=False,
    )
    assert errs

    # tamper a slot multiplier: the chip-acc chain must break
    bad_s = sets[2][2].copy()
    mi = cm.slot_cb.wit_names.index("mult_0")
    bad_s[mi, 0] = (int(bad_s[mi, 0]) + 1) % bb.P
    errs2 = MP.assert_satisfied(
        sets[:2] + [(cm.slot_compiled, cm.slot_cb, bad_s, sets[2][3],
                     sets[2][4], sets[2][5])] + sets[3:],
        raise_on_error=False,
    )
    assert errs2
