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
