"""Recursive-verifier chips (RECURSION.md build order #2/#3).

The first in-circuit verifier component: a chip that verifies sumcheck
TRANSCRIPT REDUCTIONS. Row = one round of one sumcheck instance:

  * wires: the round message nodes y_0..y_deg (ext), the round challenge
    alpha (ext), the incoming claim (ext);
  * constraints: y_0 + y_1 == claim_in, and claim_out = the degree-deg
    Lagrange extrapolation of the message at alpha (gadgets.py);
  * chaining: rounds of an instance are chained over the RAM_CUSTOM
    multiset bus exactly like keccak's round chaining
    (zkvm/chips/keccak.py): row (instance, round) READS
    (SumcheckClaim, instance, round, claim_in) and WRITES
    (SumcheckClaim, instance, round+1, claim_out). An ENDPOINTS chip
    closes the bus: per instance it writes the initial claim (round 0)
    and reads the final claim (round n_vars), exposing both as witness
    wires a caller binds to its own statement.

What this does NOT yet do (build order #3+): derive alpha from an
in-circuit transcript (Poseidon2 sponge chip over the same bus) — here
alpha is a witness column the surrounding statement must bind, exactly
like the reference recursion's first milestone binds challenges from the
outer proof object.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..fields import babybear as bb
from ..fields import ext4_host as exth
from ..mle import expression as E
from . import gadgets as G
from .circuit_builder import CircuitBuilder, RAM_CUSTOM
from .chip import compile_chip

TAG_SUMCHECK_CLAIM = 3  # RAM_CUSTOM sub-tag (keccak state = 2)
TAG_SPONGE_STATE = 4    # transcript duplex state chain (fs chips below)


@dataclass
class SumcheckVerifyChips:
    rounds_cb: CircuitBuilder
    rounds_compiled: object
    ends_cb: CircuitBuilder
    ends_compiled: object
    deg: int
    n_vars: int


def build_sumcheck_verify_chips(deg: int, n_vars: int) -> SumcheckVerifyChips:
    # -- per-round chip ------------------------------------------------------
    cb = CircuitBuilder("sumcheck_verify_rounds")
    inst = cb.create_witin("inst")
    rnd = cb.create_witin("round")
    ys = [G.ext_witness(cb, f"y{k}") for k in range(deg + 1)]
    alpha = G.ext_witness(cb, "alpha")
    claim_in = G.ext_witness(cb, "claim_in")
    # y0 + y1 == claim_in
    G.ext_require_equal(cb, "sum_check", ys[0].add(ys[1]), claim_in)
    claim_out = G.lagrange_extrapolate_gadget(cb, "lag", ys, alpha, deg)
    head = [E.Const(RAM_CUSTOM), E.Const(TAG_SUMCHECK_CLAIM), inst]
    cb.read_record(head + [rnd] + claim_in.c)
    cb.write_record(head + [rnd + 1] + claim_out.c)
    rounds_compiled = compile_chip(cb)

    # -- endpoints chip (one row per instance) -------------------------------
    eb = CircuitBuilder("sumcheck_verify_ends")
    einst = eb.create_witin("inst")
    init_claim = G.ext_witness(eb, "init_claim")
    final_claim = G.ext_witness(eb, "final_claim")
    ehead = [E.Const(RAM_CUSTOM), E.Const(TAG_SUMCHECK_CLAIM), einst]
    eb.write_record(ehead + [E.Const(0)] + init_claim.c)
    eb.read_record(ehead + [E.Const(n_vars)] + final_claim.c)
    ends_compiled = compile_chip(eb)
    return SumcheckVerifyChips(cb, rounds_compiled, eb, ends_compiled,
                               deg, n_vars)


def assign_sumcheck_verify(chips: SumcheckVerifyChips, transcripts: list):
    """Witgen from verifier-side transcript artifacts.

    ``transcripts``: per instance dict with
        msgs   (n_vars, deg+1, 4) canonical round messages
        chals  (n_vars, 4) the sampled round challenges
        claim  (4,) the initial claim
    Returns (rounds_wit, ends_wit) matrices (row counts = instances*n_vars
    and instances; claims are chained with the Lagrange host mirror)."""
    deg, n_vars = chips.deg, chips.n_vars
    m = len(transcripts)
    n_rows = m * n_vars
    cols: dict = {
        "inst": np.repeat(np.arange(m, dtype=np.uint64), n_vars),
        "round": np.tile(np.arange(n_vars, dtype=np.uint64), m),
    }
    ys = np.zeros((n_rows, deg + 1, 4), np.uint64)
    alpha = np.zeros((n_rows, 4), np.uint64)
    claim_in = np.zeros((n_rows, 4), np.uint64)
    init_claims = np.zeros((m, 4), np.uint64)
    final_claims = np.zeros((m, 4), np.uint64)
    for i, tr in enumerate(transcripts):
        cur = np.asarray(tr["claim"], np.uint64)
        init_claims[i] = cur
        msgs = np.asarray(tr["msgs"], np.uint64)
        chals = np.asarray(tr["chals"], np.uint64)
        for r in range(n_vars):
            row = i * n_vars + r
            ys[row] = msgs[r]
            alpha[row] = chals[r]
            claim_in[row] = cur
            from ..sumcheck.verifier import lagrange_extrapolate

            cur = lagrange_extrapolate(msgs[r], chals[r])
        final_claims[i] = cur
    for k in range(deg + 1):
        G.assign_ext(cols, f"y{k}", ys[:, k])
    G.assign_ext(cols, "alpha", alpha)
    G.assign_ext(cols, "claim_in", claim_in)
    G.assign_lagrange(cols, "lag", ys, alpha, deg)
    rounds_wit = np.zeros((len(chips.rounds_cb.wit_names), n_rows), np.uint64)
    for i, name in enumerate(chips.rounds_cb.wit_names):
        rounds_wit[i] = np.asarray(cols[name], np.uint64) % np.uint64(bb.P)

    ecols: dict = {"inst": np.arange(m, dtype=np.uint64)}
    G.assign_ext(ecols, "init_claim", init_claims)
    G.assign_ext(ecols, "final_claim", final_claims)
    ends_wit = np.zeros((len(chips.ends_cb.wit_names), m), np.uint64)
    for i, name in enumerate(chips.ends_cb.wit_names):
        ends_wit[i] = np.asarray(ecols[name], np.uint64) % np.uint64(bb.P)
    return rounds_wit, ends_wit, final_claims


# ---------------------------------------------------------------------------
# Fiat-Shamir-complete sumcheck verification (RECURSION.md build order #3):
# the round chip DERIVES the challenge from an in-circuit Poseidon2 duplex
# instead of witnessing it. A row = one sumcheck round of one instance:
#
#   * reads  (SpongeState,   inst, r, state[16])   -- the duplex before the
#     round (after the label flush, written by the endpoints chip for r=0)
#   * absorb permutation A: in_A = state + msg[0:8] at the rate slots
#   * absorb permutation B: in_B = out_A + msg[8:16]
#   * alpha = out_B[0:4]   (BasicTranscript: 16-elem absorb = permute between
#     slots 7/8; the sample permutes again and reads rate slots 0..3 — so a
#     deg-3 round is EXACTLY two permutations, mirrored bit-for-bit from
#     hash/transcript.py; tests assert equality with a live Transcript)
#   * reads  (SumcheckClaim, inst, r, claim_in), checks y0+y1 == claim_in,
#     writes (SumcheckClaim, inst, r+1, Lagrange(msg, alpha))
#   * writes (SpongeState,   inst, r+1, out_B)
#
# The endpoints chip performs the round-0 FLUSH permutation in-circuit
# (label-digest block absorbed before the first sample, transcript.py
# semantics), pinning the label digest and initial claim as witness wires
# the outer statement binds, and closes both bus chains.
# ---------------------------------------------------------------------------

from ..zkvm.chips.poseidon2_gadget import Lin, assign_poseidon2, build_poseidon2
from ..hash import poseidon2 as p2
from ..hash.transcript import Transcript


@dataclass
class FsSumcheckVerifyChips:
    rounds_cb: CircuitBuilder
    rounds_compiled: object
    ends_cb: CircuitBuilder
    ends_compiled: object
    deg: int
    n_vars: int


def build_fs_sumcheck_verify_chips(deg: int, n_vars: int) -> FsSumcheckVerifyChips:
    assert deg == 3, "fs round chip models the 16-elem absorb (deg 3) schedule"
    cb = CircuitBuilder("fs_sumcheck_rounds")
    inst = cb.create_witin("inst")
    rnd = cb.create_witin("round")
    ys = [G.ext_witness(cb, f"y{k}") for k in range(deg + 1)]
    state_in = [cb.create_witin(f"st{j}") for j in range(p2.WIDTH)]
    # duplex: two permutations with the message as rate blocks
    msg_elems = [c for y in ys for c in y.c]   # 16 wires, transcript order
    lin_a = [Lin.col(state_in[j]) + Lin.col(msg_elems[j]) for j in range(8)]
    lin_a += [Lin.col(state_in[j]) for j in range(8, p2.WIDTH)]
    out_a = build_poseidon2(cb, "pa", lin_a)
    lin_b = [out_a[j] + Lin.col(msg_elems[8 + j]) for j in range(8)]
    lin_b += list(out_a[8:])
    out_b = build_poseidon2(cb, "pb", lin_b)
    alpha = G.ExtWire(*[out_b[j].to_expr() for j in range(4)])
    claim_in = G.ext_witness(cb, "claim_in")
    G.ext_require_equal(cb, "sum_check", ys[0].add(ys[1]), claim_in)
    claim_out = G.lagrange_extrapolate_gadget(cb, "lag", ys, alpha, deg)
    chead = [E.Const(RAM_CUSTOM), E.Const(TAG_SUMCHECK_CLAIM), inst]
    cb.read_record(chead + [rnd] + claim_in.c)
    cb.write_record(chead + [rnd + 1] + claim_out.c)
    shead = [E.Const(RAM_CUSTOM), E.Const(TAG_SPONGE_STATE), inst]
    cb.read_record(shead + [rnd] + [Lin.col(s).to_expr() for s in state_in])
    cb.write_record(shead + [rnd + 1] + [o.to_expr() for o in out_b])
    rounds_compiled = compile_chip(cb)

    # endpoints: flush permutation + chain ends (one row per instance)
    eb = CircuitBuilder("fs_sumcheck_ends")
    einst = eb.create_witin("inst")
    pre = [eb.create_witin(f"pre{j}") for j in range(p2.WIDTH)]  # pre-flush
    flushed = build_poseidon2(eb, "pf", [Lin.col(w) for w in pre])
    init_claim = G.ext_witness(eb, "init_claim")
    final_claim = G.ext_witness(eb, "final_claim")
    final_state = [eb.create_witin(f"fin{j}") for j in range(p2.WIDTH)]
    chead = [E.Const(RAM_CUSTOM), E.Const(TAG_SUMCHECK_CLAIM), einst]
    eb.write_record(chead + [E.Const(0)] + init_claim.c)
    eb.read_record(chead + [E.Const(n_vars)] + final_claim.c)
    shead = [E.Const(RAM_CUSTOM), E.Const(TAG_SPONGE_STATE), einst]
    eb.write_record(shead + [E.Const(0)] + [o.to_expr() for o in flushed])
    eb.read_record(
        shead + [E.Const(n_vars)] + [Lin.col(w).to_expr() for w in final_state]
    )
    ends_compiled = compile_chip(eb)
    return FsSumcheckVerifyChips(cb, rounds_compiled, eb, ends_compiled,
                                 deg, n_vars)


def assign_fs_sumcheck_verify(chips: FsSumcheckVerifyChips, transcripts: list):
    """Witgen; ``transcripts`` per instance:
        msgs  (n_vars, deg+1, 4) round messages
        claim (4,) initial claim
        pre_state (16,) sponge state right BEFORE the round-0 flush
          (i.e. a host Transcript's state after its label/statement absorbs)
    Challenges are NOT inputs — they are what the duplex produces. Returns
    (rounds_wit, ends_wit, final_claims, final_states)."""
    deg, n_vars = chips.deg, chips.n_vars
    m = len(transcripts)
    n_rows = m * n_vars
    cols: dict = {
        "inst": np.repeat(np.arange(m, dtype=np.uint64), n_vars),
        "round": np.tile(np.arange(n_vars, dtype=np.uint64), m),
    }
    ys = np.zeros((n_rows, deg + 1, 4), np.uint64)
    claim_in = np.zeros((n_rows, 4), np.uint64)
    state_in = np.zeros((n_rows, p2.WIDTH), np.uint64)
    alphas = np.zeros((n_rows, 4), np.uint64)
    pre_states = np.zeros((m, p2.WIDTH), np.uint64)
    init_claims = np.zeros((m, 4), np.uint64)
    final_claims = np.zeros((m, 4), np.uint64)
    final_states = np.zeros((m, p2.WIDTH), np.uint64)
    from ..sumcheck.verifier import lagrange_extrapolate

    for i, tr in enumerate(transcripts):
        msgs = np.asarray(tr["msgs"], np.uint64)
        cur = np.asarray(tr["claim"], np.uint64)
        pre_states[i] = np.asarray(tr["pre_state"], np.uint64)
        init_claims[i] = cur
        st = p2.permute_host(pre_states[i])  # the flush
        for r in range(n_vars):
            row = i * n_vars + r
            ys[row] = msgs[r]
            claim_in[row] = cur
            state_in[row] = st
            flat = msgs[r].reshape(-1)
            st = st.copy()
            st[:8] = (st[:8] + flat[:8]) % np.uint64(bb.P)
            st = p2.permute_host(st)
            st[:8] = (st[:8] + flat[8:]) % np.uint64(bb.P)
            st = p2.permute_host(st)
            alphas[row] = st[:4]
            cur = lagrange_extrapolate(msgs[r], st[:4])
        final_claims[i] = cur
        final_states[i] = st
    for k in range(deg + 1):
        G.assign_ext(cols, f"y{k}", ys[:, k])
    for j in range(p2.WIDTH):
        cols[f"st{j}"] = state_in[:, j]
    G.assign_ext(cols, "claim_in", claim_in)
    # permutation sites A and B
    in_a = state_in.copy()
    in_a[:, :8] = (in_a[:, :8] + ys.reshape(n_rows, -1)[:, :8]) % np.uint64(bb.P)
    ua, wa, out_a = assign_poseidon2(in_a)
    names_a = [n for n in chips.rounds_cb.wit_names if n.startswith("pa_")]
    vals_a = [v for uw in zip(ua, wa) for v in uw]
    for name, v in zip(names_a, vals_a):
        cols[name] = v
    in_b = out_a.copy()
    in_b[:, :8] = (in_b[:, :8] + ys.reshape(n_rows, -1)[:, 8:]) % np.uint64(bb.P)
    ub, wb, out_b = assign_poseidon2(in_b)
    names_b = [n for n in chips.rounds_cb.wit_names if n.startswith("pb_")]
    vals_b = [v for uw in zip(ub, wb) for v in uw]
    for name, v in zip(names_b, vals_b):
        cols[name] = v
    assert np.array_equal(out_b[:, :4], alphas)
    G.assign_lagrange(cols, "lag", ys, alphas, deg)
    rounds_wit = np.zeros((len(chips.rounds_cb.wit_names), n_rows), np.uint64)
    for i, name in enumerate(chips.rounds_cb.wit_names):
        assert name in cols, name
        rounds_wit[i] = np.asarray(cols[name], np.uint64) % np.uint64(bb.P)

    ecols: dict = {"inst": np.arange(m, dtype=np.uint64)}
    for j in range(p2.WIDTH):
        ecols[f"pre{j}"] = pre_states[:, j]
        ecols[f"fin{j}"] = final_states[:, j]
    uf, wf, _flushed = assign_poseidon2(pre_states)
    names_f = [n for n in chips.ends_cb.wit_names if n.startswith("pf_")]
    vals_f = [v for uw in zip(uf, wf) for v in uw]
    for name, v in zip(names_f, vals_f):
        ecols[name] = v
    G.assign_ext(ecols, "init_claim", init_claims)
    G.assign_ext(ecols, "final_claim", final_claims)
    ends_wit = np.zeros((len(chips.ends_cb.wit_names), m), np.uint64)
    for i, name in enumerate(chips.ends_cb.wit_names):
        assert name in ecols, name
        ends_wit[i] = np.asarray(ecols[name], np.uint64) % np.uint64(bb.P)
    return rounds_wit, ends_wit, final_claims, final_states


# ---------------------------------------------------------------------------
# Merkle-path chip (RECURSION.md build order #4): one row = one tree level
# of one query walk. The row muxes (cur, sib) by the index bit, runs the
# 2-to-1 Poseidon2 compression in-circuit (compress = permute(l||r)[:8],
# hash/poseidon2.py:225), and chains (digest, index) over the bus:
#
#   reads  (MerklePath, qid, level,   idx,      cur[8])
#   writes (MerklePath, qid, level+1, idx_next, out[8])
#   with   idx == 2 * idx_next + bit,  bit boolean
#
# The endpoints chip writes each query's (leaf digest, leaf index) at level
# 0 and reads the walk's end at a fixed depth, pinning leaf digest, index,
# depth, and root as witness wires for the outer statement.
# ---------------------------------------------------------------------------

TAG_MERKLE_PATH = 5


@dataclass
class MerklePathChips:
    rows_cb: CircuitBuilder
    rows_compiled: object
    ends_cb: CircuitBuilder
    ends_compiled: object
    depth: int


def build_merkle_path_chips(depth: int) -> MerklePathChips:
    cb = CircuitBuilder("merkle_path_rows")
    qid = cb.create_witin("qid")
    level = cb.create_witin("level")
    idx = cb.create_witin("idx")
    idx_next = cb.create_witin("idx_next")
    bit = cb.create_witin("bit")
    cb.assert_bit("bit_bool", bit)
    cb.require_zero("idx_split", idx - (idx_next * 2 + bit))
    cur = [cb.create_witin(f"cur{j}") for j in range(8)]
    sib = [cb.create_witin(f"sib{j}") for j in range(8)]
    # mux: left = bit ? sib : cur ; right = bit ? cur : sib. Lin carries
    # only constant coefficients, so the muxed halves are witnessed wires
    # tied down by the degree-2 select equations below.
    lw = [cb.create_witin(f"l{j}") for j in range(8)]
    rw = [cb.create_witin(f"r{j}") for j in range(8)]
    for j in range(8):
        cb.require_zero(f"mux_l{j}", lw[j] - (cur[j] + bit * (sib[j] - cur[j])))
        cb.require_zero(f"mux_r{j}", rw[j] - (sib[j] + bit * (cur[j] - sib[j])))
    state = [Lin.col(w) for w in lw] + [Lin.col(w) for w in rw]
    out = build_poseidon2(cb, "pc", state)
    head = [E.Const(RAM_CUSTOM), E.Const(TAG_MERKLE_PATH), qid]
    cb.read_record(head + [level, idx] + [Lin.col(c).to_expr() for c in cur])
    cb.write_record(head + [level + 1, idx_next]
                    + [out[j].to_expr() for j in range(8)])
    rows_compiled = compile_chip(cb)

    eb = CircuitBuilder("merkle_path_ends")
    eqid = eb.create_witin("qid")
    leaf_idx = eb.create_witin("leaf_idx")
    leaf = [eb.create_witin(f"leaf{j}") for j in range(8)]
    root = [eb.create_witin(f"root{j}") for j in range(8)]
    ehead = [E.Const(RAM_CUSTOM), E.Const(TAG_MERKLE_PATH), eqid]
    eb.write_record(ehead + [E.Const(0), leaf_idx]
                    + [Lin.col(w).to_expr() for w in leaf])
    eb.read_record(ehead + [E.Const(depth), E.Const(0)]
                   + [Lin.col(w).to_expr() for w in root])
    ends_compiled = compile_chip(eb)
    return MerklePathChips(cb, rows_compiled, eb, ends_compiled, depth)


def assign_merkle_paths(chips: MerklePathChips, walks: list):
    """Witgen. ``walks``: per query dict with
        index (int), leaf (8,) digest, path (depth, 8) sibling digests.
    Returns (rows_wit, ends_wit, roots (m, 8))."""
    depth = chips.depth
    m = len(walks)
    n_rows = m * depth
    qid = np.repeat(np.arange(m, dtype=np.uint64), depth)
    level = np.tile(np.arange(depth, dtype=np.uint64), m)
    idx = np.zeros(n_rows, np.uint64)
    bit = np.zeros(n_rows, np.uint64)
    idx_next = np.zeros(n_rows, np.uint64)
    cur = np.zeros((n_rows, 8), np.uint64)
    sib = np.zeros((n_rows, 8), np.uint64)
    leaf_idx = np.zeros(m, np.uint64)
    leafs = np.zeros((m, 8), np.uint64)
    roots = np.zeros((m, 8), np.uint64)
    for i, w in enumerate(walks):
        ix = int(w["index"])
        leaf_idx[i] = ix
        d = np.asarray(w["leaf"], np.uint64)
        leafs[i] = d
        path = np.asarray(w["path"], np.uint64)
        assert path.shape == (depth, 8)
        for lv in range(depth):
            row = i * depth + lv
            idx[row] = ix
            bit[row] = ix & 1
            idx_next[row] = ix >> 1
            cur[row] = d
            sib[row] = path[lv]
            l, r = (path[lv], d) if ix & 1 else (d, path[lv])
            d = p2.compress_host(l, r)
            ix >>= 1
        roots[i] = d
    lw = np.where(bit[:, None] == 1, sib, cur)
    rw_ = np.where(bit[:, None] == 1, cur, sib)
    cols = {"qid": qid, "level": level, "idx": idx, "idx_next": idx_next,
            "bit": bit}
    for j in range(8):
        cols[f"cur{j}"] = cur[:, j]
        cols[f"sib{j}"] = sib[:, j]
        cols[f"l{j}"] = lw[:, j]
        cols[f"r{j}"] = rw_[:, j]
    up, wp, _out = assign_poseidon2(np.concatenate([lw, rw_], axis=1))
    names_p = [n for n in chips.rows_cb.wit_names if n.startswith("pc_")]
    vals_p = [v for uw in zip(up, wp) for v in uw]
    for name, v in zip(names_p, vals_p):
        cols[name] = v
    rows_wit = np.zeros((len(chips.rows_cb.wit_names), n_rows), np.uint64)
    for i, name in enumerate(chips.rows_cb.wit_names):
        assert name in cols, name
        rows_wit[i] = np.asarray(cols[name], np.uint64) % np.uint64(bb.P)

    ecols = {"qid": np.arange(m, dtype=np.uint64), "leaf_idx": leaf_idx}
    for j in range(8):
        ecols[f"leaf{j}"] = leafs[:, j]
        ecols[f"root{j}"] = roots[:, j]
    ends_wit = np.zeros((len(chips.ends_cb.wit_names), m), np.uint64)
    for i, name in enumerate(chips.ends_cb.wit_names):
        ends_wit[i] = np.asarray(ecols[name], np.uint64) % np.uint64(bb.P)
    return rows_wit, ends_wit, roots
