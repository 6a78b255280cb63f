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

import numpy as np

from ..fields import babybear as bb
from ..gkr import chip as chiplib
from ..gkr import recursion as R
from . import scheme

SC_STRIDE = 4096            # per-tower-group SumcheckClaim id block
CLASS_SC_BASE = 1 << 24     # class-main SumcheckClaim ids start here


def build_aggregation_witness(vk, proof, **verify_kwargs):
    """Verify ``proof`` (raising on any failure) and return the in-circuit
    verification witness: a list of (name, compiled, cb, wit) chip sets,
    bus-balanced as a whole, plus a summary dict."""
    cap: dict = {}
    scheme.verify(vk, proof, capture=cap, **verify_kwargs)

    sets = []
    rounds_by_deg: dict = {}   # deg -> [wit matrices to concat]
    rounds_cb_by_deg: dict = {}

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
        rw, bw, ew, _rc = R.assign_tower_verify(chips, [tproof], tstate,
                                                inst0=g)
        if rw.shape[1]:
            sc_cols = {name: rw[j] for j, name in
                       enumerate(chips.rounds_cb.wit_names)}
            add_rounds(3, sc_cols, rw.shape[1])
        if bw.shape[1]:
            sets.append((f"tower_g{g}_bounds", chips.bound_compiled,
                         chips.bound_cb, bw))
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
