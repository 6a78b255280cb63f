"""Aggregation witness builder (RECURSION.md build order #6, first slice).

Role mirror of the reference's recursion pipeline front-end
(ceno_recursion_v2: the shard verifier re-expressed as provable tables):
given a REAL shard ``ZKVMProof``, run the standard verifier with the
``capture`` hook (zkvm/scheme.py::verify) and replay every tower-group and
class-main stage through the recursion witgen mirrors (gkr/recursion.py),
producing bus-balanced chip witness sets that PROVE the verification of
those stages in this framework's own GKR stack.

Covered in-circuit today: all grouped tower verifications (per-level
sumchecks + eq-weighted recombination + claim folding) and all
class-batched main zerochecks (term/slot/chip/class recombination chains),
each bound to its sumcheck claim chain on the shared bus. Witnessed-but-
outer-bound: transcript challenges (alphas/mu/gammas/eq evals — the FS
duplex chips of build order #3 supply these when the transcript chain is
wired end-to-end), the tower record claims -> class batched-claim linkage,
and the jagged/PCS stages (chips exist, wiring follows).

Bus id allocation: tower group g gets SumcheckClaim ids in
[g*SC_STRIDE, (g+1)*SC_STRIDE) via the build-time sc_base; height class j
gets the single id CLASS_SC_BASE + j. TowerClaim ids are the global group
index; class-main chain ids (term/slot/chip) are allocated contiguously
across classes.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..fields import babybear as bb
from ..fields import ext4_host as exth
from ..gkr import chip as chiplib
from ..hash.transcript import Transcript
from ..pcs import basefold, jagged
from ..gkr import recursion as R
from . import scheme

SC_STRIDE = 4096            # per-tower-group SumcheckClaim id block
CLASS_SC_BASE = 1 << 24     # class-main SumcheckClaim ids start here

# Aggregation transcript domain: separate from the shard scheme LABEL so an
# aggregation proof can never be replayed as a shard proof.
LABEL_AGG = scheme.LABEL + b"/agg-v1"


def build_aggregation_witness(vk, proof, **verify_kwargs):
    """Verify ``proof`` (raising on any failure) and return the in-circuit
    verification witness: a list of (name, compiled, cb, wit) chip sets,
    bus-balanced as a whole, plus a summary dict."""
    cap: dict = {}
    scheme.verify(vk, proof, capture=cap, **verify_kwargs)

    sets = []
    rounds_by_deg: dict = {}   # deg -> [wit matrices to concat]
    rounds_cb_by_deg: dict = {}
    eqrows_wits: list = []     # eq1-chain rows, merged into one chip set
    eqrows_chip = None

    def add_rounds(deg, cols, n_rows):
        sc = rounds_cb_by_deg.get(deg)
        if sc is None:
            sc = R.build_sumcheck_verify_chips(deg, 1)
            rounds_cb_by_deg[deg] = sc
        wit = np.zeros((len(sc.rounds_cb.wit_names), n_rows), np.uint64)
        for j, name in enumerate(sc.rounds_cb.wit_names):
            wit[j] = np.asarray(cols[name], np.uint64) % np.uint64(bb.P)
        rounds_by_deg.setdefault(deg, []).append(wit)

    # -- tower groups ---------------------------------------------------------
    for g, (n_t, entries, tproof, tstate) in enumerate(cap.get("towers", [])):
        rho = chiplib.interleave_geometry(entries[0][0])[0]
        n_tv = entries[0][2] + rho
        s_p = tproof.prod_out.shape[0]
        s_l = tproof.logup_out.shape[0]
        sc_base = g * SC_STRIDE - g * n_tv  # ids = g*SC_STRIDE + level
        chips = R.build_tower_verify_chips(s_p, s_l, n_tv, sc_base=sc_base)
        rw, bw, qw, ew, _rc = R.assign_tower_verify(chips, [tproof], tstate,
                                                    inst0=g)
        if rw.shape[1]:
            sc_cols = {name: rw[j] for j, name in
                       enumerate(chips.rounds_cb.wit_names)}
            add_rounds(3, sc_cols, rw.shape[1])
        if bw.shape[1]:
            sets.append((f"tower_g{g}_bounds", chips.bound_compiled,
                         chips.bound_cb, bw))
        if qw.shape[1]:
            eqrows_wits.append(qw)
            eqrows_chip = (chips.eqrows_compiled, chips.eqrows_cb)
        sets.append((f"tower_g{g}_ends", chips.ends_compiled,
                     chips.ends_cb, ew))

    # -- class mains ----------------------------------------------------------
    cm = R.build_class_main_verify_chips()
    cm_wits = {k: [] for k in ("prod", "term", "slot", "chip", "final")}
    tid = sid = cidx = 0
    for j, (h, vctxs, cproof, tstate) in enumerate(cap.get("class_main", [])):
        pw, tw, sw, cw, fw, sc_cols, deg = R.assign_class_main_verify(
            cm, vctxs, cproof, cap["pv"], cap["challenges"], tstate,
            class_id=CLASS_SC_BASE + j, tid0=tid, sid0=sid, cidx0=cidx,
        )
        tid += tw.shape[1]
        sid += sw.shape[1]
        cidx += cw.shape[1]
        for key, w in (("prod", pw), ("term", tw), ("slot", sw),
                       ("chip", cw), ("final", fw)):
            cm_wits[key].append(w)
        add_rounds(deg, sc_cols, vctxs[0].n_vars)
    for key, cbn, compiled in (
        ("prod", cm.prod_cb, cm.prod_compiled),
        ("term", cm.term_cb, cm.term_compiled),
        ("slot", cm.slot_cb, cm.slot_compiled),
        ("chip", cm.chip_cb, cm.chip_compiled),
        ("final", cm.final_cb, cm.final_compiled),
    ):
        if cm_wits[key]:
            wit = np.concatenate(cm_wits[key], axis=1)
            if wit.shape[1]:
                sets.append((f"cm_{key}", compiled, cbn, wit))

    # -- merged eq1-chain rows chip -------------------------------------------
    if eqrows_wits:
        sets.append(("eq_rows", eqrows_chip[0], eqrows_chip[1],
                     np.concatenate(eqrows_wits, axis=1)))

    # -- merged sumcheck rounds chips (one per degree) --------------------------
    for deg, wits in sorted(rounds_by_deg.items()):
        sc = rounds_cb_by_deg[deg]
        sets.append((f"sc_rounds_d{deg}", sc.rounds_compiled,
                     sc.rounds_cb, np.concatenate(wits, axis=1)))

    summary = {
        "tower_groups": len(cap.get("towers", [])),
        "classes": len(cap.get("class_main", [])),
        "chip_sets": len(sets),
        "rows": int(sum(w.shape[1] for _, _, _, w in sets)),
    }
    return sets, summary

# ---------------------------------------------------------------------------
# Aggregation scheme: prove/verify the verifier-chip witness through the
# SAME GKR + jagged-PCS stack the shard prover uses (RECURSION.md build
# order #6, second slice). Role mirror of the recursion VM's proving step
# (ceno_recursion_v2: the shard-verifier tables are themselves proven).
#
# An aggregation proof commits ALL verifier-chip witness columns in ONE
# jagged commitment, proves every chip's read/write multisets with grouped
# towers, every height class with one batched zerocheck, and opens the
# column claims through the jagged PCS — exactly the shard pipeline minus
# fixed columns / EC chips / shard gating. ``AggKey`` (the chip list) is
# deterministic given the shard vk and the proof's public geometry; the
# outer verifier reconstructs or trusts it the same way the reference's
# recursion verifier trusts its compiled recursion program.
# ---------------------------------------------------------------------------


@dataclass
class AggChip:
    name: str
    compiled: object
    cb: object
    wit: np.ndarray        # (n_wit, N) canonical, padded pow2
    num_instances: int

    @property
    def n_rows(self) -> int:
        return self.wit.shape[1]


@dataclass
class AggKey:
    chips: list            # [(name, compiled, cb)] in canonical set order
    params: object         # BasefoldParams

    def digest_elems(self) -> np.ndarray:
        parts = [np.uint64(len(self.chips))]
        for name, compiled, cb in self.chips:
            parts.append(np.uint64(compiled.n_wit))
            parts.append(np.uint64(len(compiled.slots)))
        return np.array(parts, np.uint64)


@dataclass
class AggProof:
    public_values: np.ndarray
    num_instances: list
    witness_root: np.ndarray
    tower_groups: dict     # n_t -> tower.TowerProof
    class_main: dict       # height -> chiplib.ClassMainProof
    witness_opening: object  # jagged opening proof


class AggError(Exception):
    pass


def _pad_pow2(m: np.ndarray) -> np.ndarray:
    k = m.shape[1]
    n = max(2, 1 << max(0, (k - 1).bit_length()))
    if k < n:
        m = np.pad(m, ((0, 0), (0, n - k)))
    return m


def _agg_layout(chips: list):
    """Group chips by padded height: h -> [(idx, col_off, n_wit)]."""
    layout: dict = {}
    for i, c in enumerate(chips):
        h = c.n_rows if isinstance(c, AggChip) else c[1]
        off = sum(e[2] for e in layout.get(h, []))
        n_wit = (c.compiled.n_wit if isinstance(c, AggChip)
                 else c[0].n_wit)
        layout.setdefault(h, []).append((i, off, n_wit))
    return layout


def _agg_jagged_claims(layout: dict, slice_base: dict, openings: list):
    claims = []
    for h in sorted(layout):
        for i, off, ncols in layout[h]:
            for j in range(ncols):
                claims.append(jagged.JaggedClaim(
                    slice_base[i] + j, openings[i].point,
                    openings[i].wit_evals[j],
                ))
    return claims


def prove_chipset(chips: list, public_values: np.ndarray, params) -> AggProof:
    """Prove an arbitrary bus-balanced chip set (the generic GKR chipset
    scheme): jagged commit -> challenges -> grouped towers -> class-batched
    main zerochecks -> jagged open. Mirrors zkvm/scheme.py::prove with the
    zkVM-specific stages removed."""
    t = Transcript(LABEL_AGG)
    pv = np.asarray(public_values, np.uint64)
    t.append(AggKey([(c.name, c.compiled, c.cb) for c in chips],
                    params).digest_elems())
    t.append(pv)

    layout = _agg_layout(chips)
    jl, slice_base = scheme._jagged_plan(
        {h: [(i, off, n) for i, off, n in layout[h]] for h in layout}
    )
    mat = jagged.stack_matrix(
        jl, [(h, np.concatenate([chips[i].wit for i, _, _ in layout[h]],
                                axis=0))
             for h in sorted(layout)]
    )
    committed = basefold.commit(scheme._dev(mat), params)
    t.append(committed.root)
    for c in chips:
        t.append([c.num_instances % bb.P])

    challenges = np.array([t.sample_ext(), t.sample_ext()], np.uint64)

    inputs = []
    for c in chips:
        n = c.n_rows
        fixed = np.zeros((0, n), np.uint64)
        structural = np.zeros((0, n), np.uint64)
        inputs.append(chiplib.build_tower_inputs(
            c.compiled, c.wit, fixed, structural, pv,
            c.num_instances, challenges,
        ))

    group_members: dict = {}
    for i, ti in enumerate(inputs):
        group_members.setdefault(ti.n_tower, []).append(i)
    ctxs = [None] * len(chips)
    tower_groups = {}
    for n_t in sorted(group_members):
        members = group_members[n_t]
        gproof, gctxs = chiplib.prove_group_towers(
            [inputs[i] for i in members], t
        )
        tower_groups[n_t] = gproof
        for i, ctx in zip(members, gctxs):
            ctxs[i] = ctx

    class_main = {}
    openings = [None] * len(chips)
    for h in sorted(layout):
        members = [i for i, _, _ in layout[h]]
        cmp_proof, opens = chiplib.prove_class_main(
            [ctxs[i] for i in members], pv, challenges, t
        )
        class_main[h] = cmp_proof
        for i, op in zip(members, opens):
            openings[i] = op

    claims = _agg_jagged_claims(layout, slice_base, openings)
    opening = jagged.open_jagged(committed, jl, claims, t, params)
    return AggProof(
        pv, [c.num_instances for c in chips], committed.root,
        tower_groups, class_main, opening,
    )


def verify_chipset(key: AggKey, proof: AggProof) -> bool:
    """Verify a generic chipset proof: transcript replay, grouped tower
    verification, global read-write product + logup-sum checks, class main
    recombination, jagged PCS verify."""
    if len(proof.num_instances) != len(key.chips):
        raise AggError("chip count mismatch")
    t = Transcript(LABEL_AGG)
    pv = np.asarray(proof.public_values, np.uint64)
    t.append(key.digest_elems())
    t.append(pv)

    heights = []
    for (name, compiled, cb), k in zip(key.chips, proof.num_instances):
        if k <= 0:
            raise AggError(f"{name}: empty chip in aggregation proof")
        heights.append(max(2, 1 << max(0, (int(k) - 1).bit_length())))
    entries_all = [
        (compiled, int(k), h.bit_length() - 1)
        for (name, compiled, cb), k, h in zip(
            key.chips, proof.num_instances, heights)
    ]
    layout: dict = {}
    for i, h in enumerate(heights):
        off = sum(e[2] for e in layout.get(h, []))
        layout.setdefault(h, []).append((i, off, key.chips[i][1].n_wit))
    jl, slice_base = scheme._jagged_plan(layout)

    t.append(proof.witness_root)
    for k in proof.num_instances:
        t.append([int(k) % bb.P])
    challenges = np.array([t.sample_ext(), t.sample_ext()], np.uint64)

    group_members: dict = {}
    for i, (compiled, k, n_vars) in enumerate(entries_all):
        rho, _, _, _ = chiplib.interleave_geometry(compiled)
        group_members.setdefault(heights[i] << rho, []).append(i)
    if set(proof.tower_groups) != set(group_members):
        raise AggError("tower group size set mismatch")

    prod_r = exth.one()
    prod_w = exth.one()
    logup_num = np.zeros(4, np.uint64)
    logup_den = exth.one()
    vctxs = [None] * len(key.chips)
    for n_t in sorted(group_members):
        members = group_members[n_t]
        results = chiplib.verify_group_towers(
            [entries_all[i] for i in members],
            proof.tower_groups[n_t], pv, challenges, t,
        )
        for i, (vctx, prod_values, logup_fracs) in zip(members, results):
            compiled = key.chips[i][1]
            vctxs[i] = vctx
            pi = 0
            if compiled.r_exprs:
                prod_r = exth.mul(prod_r, prod_values[pi])
                pi += 1
            if compiled.w_exprs:
                prod_w = exth.mul(prod_w, prod_values[pi])
                pi += 1
            for s in range(logup_fracs.shape[0]):
                p, q = logup_fracs[s]
                logup_num = exth.add(
                    exth.mul(logup_num, q), exth.mul(p, logup_den)
                )
                logup_den = exth.mul(logup_den, q)

    if not np.array_equal(prod_r, prod_w):
        raise AggError("global read/write product mismatch")
    if logup_num.any():
        raise AggError("global logup sum is nonzero")

    if set(proof.class_main) != set(layout):
        raise AggError("class main height set mismatch")
    openings = [None] * len(key.chips)
    for h in sorted(layout):
        members = [i for i, _, _ in layout[h]]
        opens = chiplib.verify_class_main(
            [vctxs[i] for i in members], proof.class_main[h],
            pv, challenges, t,
        )
        for i, op in zip(members, opens):
            openings[i] = op

    claims = _agg_jagged_claims(layout, slice_base, openings)
    jagged.verify_jagged(
        proof.witness_root, jl, claims, proof.witness_opening, t, key.params,
    )
    return True


def prove_aggregation(vk, proof, params=None, **verify_kwargs):
    """Build the aggregation witness from a REAL shard proof (verifying it
    in the process) and prove it through the chipset scheme. Returns
    (AggKey, AggProof). Public values bind the shard vk digest + the
    shard's public values."""
    sets, summary = build_aggregation_witness(vk, proof, **verify_kwargs)
    chips = [
        AggChip(name, compiled, cb, _pad_pow2(wit), wit.shape[1])
        for name, compiled, cb, wit in sets
    ]
    pv = np.concatenate([
        vk.digest_elems() % np.uint64(bb.P),
        np.asarray(proof.public_values, np.uint64) % np.uint64(bb.P),
    ])
    params = params or vk.params
    aproof = prove_chipset(chips, pv, params)
    key = AggKey([(c.name, c.compiled, c.cb) for c in chips], params)
    return key, aproof


def verify_aggregation(key: AggKey, aproof: AggProof) -> bool:
    """Verify an aggregation proof's GKR + PCS layers. The semantic link
    back to the shard statement (FS-derived challenges, record-claim ->
    batched-claim linkage, PCS query phase in-circuit) is carried by the
    corresponding chip families as they are wired in (RECURSION.md)."""
    return verify_chipset(key, aproof)
