"""Tower arguments: grand products and LogUp fraction sums over record MLEs.

Role mirror of the reference's tower machinery (SURVEY.md §3.2):
``infer_tower_product_witness`` / ``infer_tower_logup_witness``
(ceno_zkvm scheme/utils.rs:487-655) -> :func:`product_layers` /
:func:`logup_layers`; ``CpuTowerProver::create_proof`` (scheme/cpu/mod.rs:346)
-> :func:`prove_towers`; ``TowerVerify::verify`` (scheme/verifier.rs:1371) ->
:func:`verify_towers`.

Protocol (this framework's convention — halves split instead of the
reference's interleave, matching our top-variable fold):
  * layer k has 2^k entries; parent entries pair the two contiguous halves of
    layer k+1: prod: v_k = L*R; logup: p_k = pL*qR + pR*qL, q_k = qL*qR where
    L/R = first/second half.
  * The proof starts from layer 1 (2 values per spec, absorbed as out_evals);
    the verifier computes the total product / fraction itself.
  * Level k proves layer-k claims at point rt from layer k+1 via ONE batched
    degree-3 sumcheck over k vars: fresh alpha-powers batch all specs' claims,
    a single shared eq(rt, .) column, then evals (L_s, R_s / pL,pR,qL,qR per
    spec) are absorbed and one mu challenge extends the point: rt' = r ++ [mu].
  * After the last level the per-spec claims are the *record MLE* evaluations
    at the final point — handed to the main constraint sumcheck, which relates
    records to committed witness columns.

Transcript order (fixed contract, see verify_towers):
  out_evals (prod then logup) -> rt -> per level: alpha-pows, round msgs,
  evals, mu.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import babybear as bb
from ..fields import ext4
from ..fields import ext4_host as exth
from ..hash.transcript import Transcript
from ..mle import ops
from ..sumcheck import prover as sc_prover
from ..sumcheck import verifier as sc_verifier
from ..utils import aotcache as aot
from ..sumcheck import host_impl as H
from ..sumcheck.prover import TermSpec


# ---------------------------------------------------------------------------
# Witness layer inference (device)
# ---------------------------------------------------------------------------

@aot.jit
def product_layers(v):
    """All layers of the product tree, input (4, N) ext -> [layer1, ..., input].

    layers[k-1] has 2^k entries (k = 1..n). Jitted: ONE program per input
    size instead of ~log2(N) eager tunnel dispatches (logup_layers below is
    jitted for the same reason)."""
    layers = [v]
    while v.shape[-1] > 2:
        half = v.shape[-1] // 2
        v = ext4.mul(v[:, :half], v[:, half:])
        layers.append(v)
    return tuple(reversed(layers))


import os as _os

# with CENO_TPU_FUSED=1, device levels are ~1 fused call each, so only trivial
# levels stay in numpy; otherwise (per-round dispatch) host handles small ones.
# CENO_TPU_TOWER_HOST_N overrides: small device levels are tunnel-latency
# bound (~0.2-0.6s each), so routing levels below ~2^16 to the vectorized
# host kernels can beat the device (measure per deployment).
_TOWER_HOST_N = int(_os.environ.get("CENO_TPU_TOWER_HOST_N", 0)) or (
    min(H.HOST_N, 256)
    if _os.environ.get("CENO_TPU_FUSED", "0") == "1" and H.HOST_N < (1 << 16)
    else H.HOST_N
)


@aot.jit
def _pack_layers(layers):
    """Concatenate a tuple of (4, m) layers into one (4, sum m) array."""
    return jnp.concatenate(layers, axis=-1)


@aot.jit
def split_specs(layers):
    """Split each (4, 2h) layer into contiguous halves, returned as ONE
    (4, 2*S, h) block (cols ordered [lo_0, hi_0, lo_1, hi_1, ...]). A single
    program output is load-bearing through the axon tunnel — tuple outputs
    each pay a round trip (TODO.md findings); the sumcheck banks accept
    (4, k, N) blocks."""
    out = []
    for l in layers:
        half = l.shape[-1] // 2
        out.append(l[:, None, :half])
        out.append(l[:, None, half:])
    return jnp.concatenate(out, axis=1)


@aot.jit
def logup_layers(p, q):
    """Fraction-sum tree: returns (p_layers, q_layers) tuples, layer1 first."""
    ps, qs = [p], [q]
    while p.shape[-1] > 2:
        half = p.shape[-1] // 2
        pl, pr = p[:, :half], p[:, half:]
        ql, qr = q[:, :half], q[:, half:]
        p = ext4.add(ext4.mul(pl, qr), ext4.mul(pr, ql))
        q = ext4.mul(ql, qr)
        ps.append(p)
        qs.append(q)
    return tuple(reversed(ps)), tuple(reversed(qs))


# ---------------------------------------------------------------------------
# Proof container
# ---------------------------------------------------------------------------

@dataclass
class TowerProof:
    prod_out: np.ndarray    # (S_p, 2, 4) canonical layer-1 values
    logup_out: np.ndarray   # (S_l, 2, 2, 4): [spec][p|q][slot] canonical
    round_msgs: list = field(default_factory=list)  # per level (k, deg+1, 4)
    level_evals: list = field(default_factory=list)  # per level (n_evals, 4)


def _fold_two(v0, v1, r):
    """(1-r)*v0 + r*v1 on host canonical ext values."""
    return exth.add(v0, exth.mul(r, exth.sub(v1, v0)))


# ---------------------------------------------------------------------------
# Prover
# ---------------------------------------------------------------------------

def _product_layers_host(v: np.ndarray) -> list:
    """Host mirror of product_layers on canonical (N, 4) arrays."""
    layers = [v]
    while v.shape[0] > 2:
        half = v.shape[0] // 2
        v = exth.mul(v[:half], v[half:])
        layers.append(v)
    return list(reversed(layers))


def _logup_layers_host(p: np.ndarray, q: np.ndarray):
    ps, qs = [p], [q]
    while p.shape[0] > 2:
        half = p.shape[0] // 2
        pl, pr = p[:half], p[half:]
        ql, qr = q[:half], q[half:]
        p = exth.add(exth.mul(pl, qr), exth.mul(pr, ql))
        q = exth.mul(ql, qr)
        ps.append(p)
        qs.append(q)
    return list(reversed(ps)), list(reversed(qs))


def prove_towers_host(prod_records, logup_records, transcript: Transcript):
    """All-host tower proof for canonical (N, 4) numpy records (small chips:
    device dispatch and tracing dominate below HOST_N)."""
    n_vars = (
        prod_records[0].shape[0] if prod_records else logup_records[0][0].shape[0]
    ).bit_length() - 1
    prod_lys = [_product_layers_host(v) for v in prod_records]
    logup_lys = [_logup_layers_host(p, q) for p, q in logup_records]

    prod_out = (
        np.stack([ls[0] for ls in prod_lys]).astype(np.uint64)
        if prod_lys else np.zeros((0, 2, 4), np.uint64)
    )
    logup_out = (
        np.stack([np.stack([pl[0], ql[0]]) for pl, ql in logup_lys]).astype(np.uint64)
        if logup_lys else np.zeros((0, 2, 2, 4), np.uint64)
    )
    proof = TowerProof(prod_out, logup_out)
    for s in range(len(prod_lys)):
        transcript.append(prod_out[s].ravel())
    for s in range(len(logup_lys)):
        transcript.append(logup_out[s].ravel())

    rt = np.array([transcript.sample_ext()], np.uint64)
    prod_claims = [_fold_two(prod_out[s][0], prod_out[s][1], rt[0]) for s in range(len(prod_lys))]
    logup_claims = [
        [
            _fold_two(logup_out[s][0][0], logup_out[s][0][1], rt[0]),
            _fold_two(logup_out[s][1][0], logup_out[s][1][1], rt[0]),
        ]
        for s in range(len(logup_lys))
    ]

    for level in range(1, n_vars):
        n_claims = len(prod_claims) + 2 * len(logup_claims)
        alphas = transcript.sample_ext_pows(n_claims)
        half = 1 << level
        eq_col = H.build_eq_host(rt)
        ext_cols = [eq_col]
        term_list = []
        a = 0
        for s in range(len(prod_lys)):
            nxt = prod_lys[s][level]
            li = len(ext_cols)
            ext_cols.extend([nxt[:half], nxt[half:]])
            term_list.append(TermSpec(alphas[a], eidx=(0, li, li + 1)))
            a += 1
        for s in range(len(logup_lys)):
            pl_, ql_ = logup_lys[s][0][level], logup_lys[s][1][level]
            i0 = len(ext_cols)
            ext_cols.extend([pl_[:half], pl_[half:], ql_[:half], ql_[half:]])
            pL, pR, qL, qR = i0, i0 + 1, i0 + 2, i0 + 3
            term_list.append(TermSpec(alphas[a], eidx=(0, pL, qR)))
            term_list.append(TermSpec(alphas[a], eidx=(0, pR, qL)))
            term_list.append(TermSpec(alphas[a + 1], eidx=(0, qL, qR)))
            a += 2
        out = sc_prover.prove([], ext_cols, term_list, level, transcript)
        proof.round_msgs.append(out.proof.round_msgs)
        evals = out.final_ext[1:]
        proof.level_evals.append(evals.copy())
        transcript.append(evals.ravel())
        mu = np.array(transcript.sample_ext(), np.uint64)
        rt = np.concatenate([out.point, mu[None, :]], axis=0)
        e = 0
        new_prod, new_logup = [], []
        for s in range(len(prod_lys)):
            new_prod.append(_fold_two(evals[e], evals[e + 1], mu))
            e += 2
        for s in range(len(logup_lys)):
            new_logup.append(
                [_fold_two(evals[e], evals[e + 1], mu), _fold_two(evals[e + 2], evals[e + 3], mu)]
            )
            e += 4
        prod_claims, logup_claims = new_prod, new_logup

    record_claims = (
        np.stack(prod_claims) if prod_claims else np.zeros((0, 4), np.uint64),
        np.stack([np.stack(c) for c in logup_claims])
        if logup_claims else np.zeros((0, 2, 4), np.uint64),
    )
    return proof, rt, record_claims


def prove_towers(
    prod_records: list,
    logup_records: list,
    transcript: Transcript,
):
    """Prove grand products / logup sums of ext record MLEs (device Monty).

    ``prod_records``: list of (4, N) arrays. ``logup_records``: list of
    (p, q) pairs of (4, N). All must share the same N = 2^n, n >= 1.
    Returns (TowerProof, final_point (n,4) canonical, record_claims) where
    record_claims = (prod_claims (S_p, 4), logup_claims (S_l, 2, 4)).
    Host canonical (N, 4) numpy inputs are routed to prove_towers_host.
    """
    if (prod_records and isinstance(prod_records[0], np.ndarray)) or (
        logup_records and isinstance(logup_records[0][0], np.ndarray)
    ):
        return prove_towers_host(prod_records, logup_records, transcript)
    n_vars = ops.num_vars(prod_records[0] if prod_records else logup_records[0][0])
    prod_lys = [product_layers(v) for v in prod_records]
    logup_lys = [logup_layers(p, q) for p, q in logup_records]

    def canon2(x):  # (4, k) device -> (k, 4) canonical host
        return bb.np_from_monty(np.asarray(x)).astype(np.uint64).T

    # pull small layers to host in ONE packed transfer per spec (each
    # np.asarray fetch pays a full tunnel round trip)
    def hostify(layers):
        small = [l for l in layers if l.shape[-1] <= _TOWER_HOST_N]
        if not small:
            return [None] * len(layers)
        packed = canon2(_pack_layers(tuple(small)))
        out = []
        off = 0
        for l in layers:
            m = l.shape[-1]
            if m <= _TOWER_HOST_N:
                out.append(packed[off : off + m])
                off += m
            else:
                out.append(None)
        return out

    prod_host = [hostify(ls) for ls in prod_lys]
    logup_host = [(hostify(pl), hostify(ql)) for pl, ql in logup_lys]

    prod_out = np.stack([canon2(ls[0]) for ls in prod_lys]) if prod_lys else np.zeros((0, 2, 4), np.uint64)
    logup_out = (
        np.stack([np.stack([canon2(pl[0]), canon2(ql[0])]) for pl, ql in logup_lys])
        if logup_lys
        else np.zeros((0, 2, 2, 4), np.uint64)
    )
    proof = TowerProof(prod_out, logup_out)

    for s in range(len(prod_lys)):
        transcript.append(prod_out[s].ravel())
    for s in range(len(logup_lys)):
        transcript.append(logup_out[s].ravel())

    rt = np.array([transcript.sample_ext()], np.uint64)  # (1, 4) point
    # initial claims at layer 1
    prod_claims = [_fold_two(prod_out[s][0], prod_out[s][1], rt[0]) for s in range(len(prod_lys))]
    logup_claims = [
        [
            _fold_two(logup_out[s][0][0], logup_out[s][0][1], rt[0]),
            _fold_two(logup_out[s][1][0], logup_out[s][1][1], rt[0]),
        ]
        for s in range(len(logup_lys))
    ]

    use_fused_tower = _os.environ.get("CENO_TPU_FUSED_TOWER", "1") == "1"
    # Bound the UNROLLED level count per fused program: the remote compiler
    # of the axon tunnel OOM-kills giant programs (measured round 3: ~11
    # unrolled levels at 2^20 -> tpu_compile_helper SIGKILL), and program
    # size is linear in levels. Chunking keeps proofs byte-identical.
    max_fused = int(_os.environ.get("CENO_TPU_FUSED_TOWER_LEVELS", "6"))
    level = 1
    while level < n_vars:
        if use_fused_tower and 2 * (1 << level) > _TOWER_HOST_N:
            # remaining (device) levels, <= max_fused per XLA program
            last = min(n_vars, level + max_fused)
            rt, prod_claims, logup_claims = _prove_levels_fused(
                proof, prod_lys, logup_lys, level, last, rt,
                prod_claims, logup_claims, transcript,
            )
            level = last
            continue
        n_claims = len(prod_claims) + 2 * len(logup_claims)
        alphas = transcript.sample_ext_pows(n_claims)
        half = 1 << level
        # fully-fused device sumchecks make even small levels ~1 call; only
        # trivially small levels run in numpy
        use_host = 2 * half <= _TOWER_HOST_N
        # build columns: shared eq + per-spec halves of layer level+1
        if use_host:
            eq_col = H.build_eq_host(rt)
            level_layers = [prod_host[s][level] for s in range(len(prod_lys))] + [
                logup_host[s][i][level] for s in range(len(logup_lys)) for i in (0, 1)
            ]
            split = []
            for l in level_layers:
                split.extend([l[:half], l[half:]])
        else:
            eq_col = ops.build_eq_jit(jnp.asarray(bb.np_to_monty(rt)))
            level_layers = tuple(
                [prod_lys[s][level] for s in range(len(prod_lys))]
                + [
                    logup_lys[s][i][level]
                    for s in range(len(logup_lys))
                    for i in (0, 1)
                ]
            )
        # ext bank: eq at 0, then 2 half-columns per layer in layer order —
        # host appends per-column arrays, device ONE stacked block; the
        # column POSITIONS (and so the terms and the proof bytes) match.
        if use_host:
            ext_cols = [eq_col] + split
        else:
            ext_cols = [eq_col, split_specs(level_layers)]
        term_list = []
        a = 0
        li = 1
        for s in range(len(prod_lys)):
            term_list.append(TermSpec(alphas[a], eidx=(0, li, li + 1)))
            li += 2
            a += 1
        for s in range(len(logup_lys)):
            pL, pR, qL, qR = li, li + 1, li + 2, li + 3
            li += 4
            term_list.append(TermSpec(alphas[a], eidx=(0, pL, qR)))
            term_list.append(TermSpec(alphas[a], eidx=(0, pR, qL)))
            term_list.append(TermSpec(alphas[a + 1], eidx=(0, qL, qR)))
            a += 2
        out = sc_prover.prove([], ext_cols, term_list, level, transcript)
        proof.round_msgs.append(out.proof.round_msgs)
        # evals: per spec the half evaluations at the sumcheck point
        evals = out.final_ext[1:]  # drop eq
        proof.level_evals.append(evals.copy())
        transcript.append(evals.ravel())
        mu = np.array(transcript.sample_ext(), np.uint64)
        # fold claims and extend point: rt' = point ++ [mu] (mu binds top var)
        rt = np.concatenate([out.point, mu[None, :]], axis=0)
        e = 0
        new_prod = []
        for s in range(len(prod_lys)):
            new_prod.append(_fold_two(evals[e], evals[e + 1], mu))
            e += 2
        new_logup = []
        for s in range(len(logup_lys)):
            pLv, pRv, qLv, qRv = evals[e], evals[e + 1], evals[e + 2], evals[e + 3]
            new_logup.append([_fold_two(pLv, pRv, mu), _fold_two(qLv, qRv, mu)])
            e += 4
        prod_claims, logup_claims = new_prod, new_logup
        level += 1

    record_claims = (
        np.stack(prod_claims) if prod_claims else np.zeros((0, 4), np.uint64),
        np.stack([np.stack(c) for c in logup_claims])
        if logup_claims
        else np.zeros((0, 2, 4), np.uint64),
    )
    return proof, rt, record_claims


# ---------------------------------------------------------------------------
# Verifier (host)
# ---------------------------------------------------------------------------

class TowerError(Exception):
    pass


def verify_towers(
    proof: TowerProof,
    n_vars: int,
    transcript: Transcript,
):
    """Replays the prover's transcript; returns (final_point, prod_claims,
    logup_claims, prod_values (S_p,4), logup_fractions (S_l, 2, 4)).

    prod_values[s] is the claimed total product; logup_fractions[s] = (p, q)
    of the claimed total fraction sum. Raises TowerError on any mismatch.
    """
    s_p = proof.prod_out.shape[0]
    s_l = proof.logup_out.shape[0]
    for s in range(s_p):
        transcript.append(proof.prod_out[s].ravel())
    for s in range(s_l):
        transcript.append(proof.logup_out[s].ravel())

    # totals from layer-1 outs
    prod_values = np.stack(
        [exth.mul(proof.prod_out[s][0], proof.prod_out[s][1]) for s in range(s_p)]
    ) if s_p else np.zeros((0, 4), np.uint64)
    logup_fracs = []
    for s in range(s_l):
        p0, p1 = proof.logup_out[s][0]
        q0, q1 = proof.logup_out[s][1]
        logup_fracs.append(
            np.stack([
                exth.add(exth.mul(p0, q1), exth.mul(p1, q0)),
                exth.mul(q0, q1),
            ])
        )
    logup_fracs = np.stack(logup_fracs) if s_l else np.zeros((0, 2, 4), np.uint64)

    rt = np.array([transcript.sample_ext()], np.uint64)
    prod_claims = [
        _fold_two(proof.prod_out[s][0], proof.prod_out[s][1], rt[0]) for s in range(s_p)
    ]
    logup_claims = [
        [
            _fold_two(proof.logup_out[s][0][0], proof.logup_out[s][0][1], rt[0]),
            _fold_two(proof.logup_out[s][1][0], proof.logup_out[s][1][1], rt[0]),
        ]
        for s in range(s_l)
    ]

    for level in range(1, n_vars):
        n_claims = s_p + 2 * s_l
        alphas = transcript.sample_ext_pows(n_claims)
        batched = np.zeros(4, np.uint64)
        a = 0
        for s in range(s_p):
            batched = exth.add(batched, exth.mul(alphas[a], prod_claims[s]))
            a += 1
        for s in range(s_l):
            batched = exth.add(batched, exth.mul(alphas[a], logup_claims[s][0]))
            batched = exth.add(batched, exth.mul(alphas[a + 1], logup_claims[s][1]))
            a += 2
        point, final_claim = sc_verifier.verify(
            batched, proof.round_msgs[level - 1], level, transcript, deg=3
        )
        evals = np.asarray(proof.level_evals[level - 1], np.uint64)
        # recombination check: final_claim == eq(rt, point) * sum alpha_i * rel_i
        eq_v = exth.eq_eval(rt.astype(np.uint64), point)
        acc = np.zeros(4, np.uint64)
        e = 0
        a = 0
        for s in range(s_p):
            acc = exth.add(acc, exth.mul(alphas[a], exth.mul(evals[e], evals[e + 1])))
            e += 2
            a += 1
        for s in range(s_l):
            pLv, pRv, qLv, qRv = evals[e], evals[e + 1], evals[e + 2], evals[e + 3]
            num = exth.add(exth.mul(pLv, qRv), exth.mul(pRv, qLv))
            acc = exth.add(acc, exth.mul(alphas[a], num))
            acc = exth.add(acc, exth.mul(alphas[a + 1], exth.mul(qLv, qRv)))
            e += 4
            a += 2
        if not np.array_equal(exth.mul(eq_v, acc), final_claim):
            from ..utils import replay

            if not replay.structure_only():
                raise TowerError(f"level {level}: eval recombination mismatch")
        transcript.append(evals.ravel())
        mu = np.array(transcript.sample_ext(), np.uint64)
        rt = np.concatenate([point, mu[None, :]], axis=0)
        new_prod, new_logup = [], []
        e = 0
        for s in range(s_p):
            new_prod.append(_fold_two(evals[e], evals[e + 1], mu))
            e += 2
        for s in range(s_l):
            new_logup.append(
                [_fold_two(evals[e], evals[e + 1], mu), _fold_two(evals[e + 2], evals[e + 3], mu)]
            )
            e += 4
        prod_claims, logup_claims = new_prod, new_logup

    prod_claims = np.stack(prod_claims) if prod_claims else np.zeros((0, 4), np.uint64)
    logup_claims = (
        np.stack([np.stack(c) for c in logup_claims]) if logup_claims else np.zeros((0, 2, 4), np.uint64)
    )
    return rt, prod_claims, logup_claims, prod_values, logup_fracs


# ---------------------------------------------------------------------------
# Fully-fused device tower: ALL device levels in ONE XLA program with the
# on-device duplex (sumcheck/fused.py pattern extended across levels). Each
# level samples its batching alpha, builds eq(rt) in-kernel, runs the
# level's sumcheck rounds (unrolled head + stretched lax.scan tail), absorbs
# the level evals and samples mu — so a tower group pays ONE dispatch+fetch
# instead of one per level (~0.3-1.3s each through the axon tunnel). The
# host replays the identical absorb/sample sequence afterwards; proofs are
# byte-identical to the per-level path (env CENO_TPU_FUSED_TOWER=0 falls
# back, tests compare).
# ---------------------------------------------------------------------------

from ..sumcheck.fused import _DeviceDuplex, pick_head, SCAN_MAX_LOG  # noqa: E402
from ..sumcheck.prover import compile_terms  # noqa: E402


def _level_static(n_prod: int, n_logup: int, level: int):
    """Static per-level term structure: (bidx, eidx, midx, alpha_idx, deg)."""
    from ..sumcheck.prover import TermSpec
    from ..sumcheck import terms as T

    dummy = np.zeros(4, np.uint64)
    dummy[0] = 1
    term_list = []
    alpha_idx = []
    li = 1
    a = 0
    for _ in range(n_prod):
        term_list.append(TermSpec(dummy, eidx=(0, li, li + 1)))
        alpha_idx.append(a)
        li += 2
        a += 1
    for _ in range(n_logup):
        pL, pR, qL, qR = li, li + 1, li + 2, li + 3
        li += 4
        term_list.append(TermSpec(dummy, eidx=(0, pL, qR)))
        term_list.append(TermSpec(dummy, eidx=(0, pR, qL)))
        term_list.append(TermSpec(dummy, eidx=(0, qL, qR)))
        alpha_idx += [a, a, a + 1]
        a += 2
    n_ext = li - 1 + 1  # eq + split cols
    bidx, eidx, scal, deg = compile_terms(term_list, 0, n_ext)
    # compile_terms pads the term count to a pow2 with zero-scalar sentinel
    # terms: pad alpha_idx to match, pointing the sentinels at a ZERO slot
    # appended to the power table (see the pows construction in the kernel)
    n_pad = bidx.shape[0] - len(alpha_idx)
    n_claims = n_prod + 2 * n_logup
    alpha_idx = alpha_idx + [n_claims] * n_pad
    midx = T.merge_indices(bidx, eidx, 0, n_ext)
    return (jnp.asarray(bidx), jnp.asarray(eidx), jnp.asarray(midx),
            np.asarray(alpha_idx, np.int32), deg)


def _fused_tower_levels_impl(level_layers, t_state, rt1, *, n_prod, n_logup,
                             first_level, n_vars, pos, sq_pos, absorbed):
    from ..sumcheck import terms as T

    duplex = _DeviceDuplex(t_state, pos, sq_pos, absorbed)
    n_claims = n_prod + 2 * n_logup
    rt = rt1  # (v, 4) Monty, LSB-first
    flat_parts = []
    for idx, level in enumerate(range(first_level, n_vars)):
        bidx, eidx, midx, alpha_idx, deg = _level_static(
            n_prod, n_logup, level
        )
        alpha = duplex.sample_ext()
        pows = [jnp.asarray(
            np.array([bb.MONTY_ONE, 0, 0, 0], np.uint32)
        )]
        for _ in range(1, n_claims):
            pows.append(ext4.mul(pows[-1], alpha))
        pows.append(jnp.zeros(4, jnp.uint32))    # sentinel slot (padding)
        pows = jnp.stack(pows, axis=1)           # (4, n_claims + 1)
        scalars = pows[:, alpha_idx]             # (4, T_padded)
        eq_col = ops.build_eq(rt)                # (4, 2^level)
        blocks = []
        for l in level_layers[idx]:              # raw (4, 2^level) layers
            half_ = l.shape[-1] // 2
            blocks.append(l[:, None, :half_])
            blocks.append(l[:, None, half_:])
        base_bank, ext_bank = T.make_banks(
            [], [eq_col, jnp.concatenate(blocks, axis=1)], 1 << level
        )
        # round loop: head unrolled + stretched scan (fused_rounds logic,
        # with the sampled challenges collected for the rt update)
        head = pick_head(level)
        msgs = []
        chals = []
        merged = None
        for rnd in range(head + 1):
            if rnd == 0:
                ev = T.round_evals(base_bank, ext_bank, bidx, eidx, scalars,
                                   deg=deg)
            else:
                ev = T.round_evals_ext(merged, midx, scalars, deg=deg)
            msgs.append(ev)
            duplex.append(ev.reshape(-1))
            ch = duplex.sample_ext()
            chals.append(ch)
            if rnd == 0:
                merged = T.fold_banks(base_bank, ext_bank, ch)
            else:
                merged = T.fold_ext_bank(merged, ch)
        n_scan = level - 1 - head
        if n_scan > 0:
            inv2 = pow(2, bb.P - 2, bb.P)
            invf = jnp.asarray(bb.np_to_monty(
                np.array([pow(inv2, j, bb.P) for j in range(n_scan)],
                         np.uint64).astype(np.uint32)
            ))

            def body(carry, invf_j):
                bank, st = carry
                d = _DeviceDuplex(st, 0, 4, False)
                ev = T.round_evals_ext(bank, midx, scalars, deg=deg)
                ev = bb.mul(invf_j, ev)
                d.append(ev.reshape(-1))
                ch = d.sample_ext()
                half = bank.shape[2] // 2
                a_ = bank[:, :, :half]
                b_ = bank[:, :, half:]
                c_ = ext4.add(a_, ext4.mul(ch[:, None, None],
                                           ext4.sub(b_, a_)))
                return (jnp.repeat(c_, 2, axis=2), d.state), (ev, ch)

            (merged, st), (scan_msgs, scan_chals) = jax.lax.scan(
                body, (merged, duplex.state), invf
            )
            duplex.state = st
            duplex.pos, duplex.sq_pos, duplex.absorbed = 0, 4, False
            msgs = jnp.concatenate([jnp.stack(msgs), scan_msgs], axis=0)
            chals = jnp.concatenate([jnp.stack(chals), scan_chals], axis=0)
        else:
            msgs = jnp.stack(msgs)
            chals = jnp.stack(chals)
        evals = merged[:, 1:-1, 0]               # (4, S_e): drop eq+sentinel
        duplex.append(evals.T.reshape(-1))
        mu = duplex.sample_ext()
        rt = jnp.concatenate([chals[::-1], mu[None, :]], axis=0)
        flat_parts.append(msgs.reshape(-1))
        flat_parts.append(evals.T.reshape(-1))
    return jnp.concatenate(flat_parts), duplex.state


_fused_tower_levels = aot.jit(
    _fused_tower_levels_impl,
    static_argnames=("n_prod", "n_logup", "first_level", "n_vars", "pos",
                     "sq_pos", "absorbed"),
)


def _prove_levels_fused(proof, prod_lys, logup_lys, first_level, last_level,
                        rt, prod_claims, logup_claims, transcript):
    """Run levels [first_level, last_level) through _fused_tower_levels and
    replay the absorb/sample sequence on the host transcript. Returns the
    updated (rt, prod_claims, logup_claims)."""
    n_prod, n_logup = len(prod_lys), len(logup_lys)
    n_claims = n_prod + 2 * n_logup
    s_e = 2 * n_prod + 4 * n_logup
    level_layers = tuple(
        tuple(
            [prod_lys[s][level] for s in range(n_prod)]
            + [logup_lys[s][i][level] for s in range(n_logup) for i in (0, 1)]
        )
        for level in range(first_level, last_level)
    )
    st, pos, sq_pos, absorbed = transcript.export_state()
    flat_dev, end_state = _fused_tower_levels(
        level_layers,
        jnp.asarray(bb.np_to_monty(st.astype(np.uint32))),
        jnp.asarray(bb.np_to_monty(np.asarray(rt, np.uint64))),
        n_prod=n_prod, n_logup=n_logup, first_level=first_level,
        n_vars=last_level, pos=pos, sq_pos=sq_pos, absorbed=absorbed,
    )
    flat = bb.np_from_monty(np.asarray(flat_dev)).astype(np.uint64)
    deg = 3
    off = 0
    for level in range(first_level, last_level):
        transcript.sample_ext_pows(n_claims)  # alphas (values replayed)
        n_m = level * (deg + 1) * 4
        msgs = flat[off : off + n_m].reshape(level, deg + 1, 4)
        off += n_m
        chs = []
        for r in range(level):
            transcript.append(msgs[r].ravel())
            chs.append(np.array(transcript.sample_ext(), np.uint64))
        evals = flat[off : off + s_e * 4].reshape(s_e, 4)
        off += s_e * 4
        proof.round_msgs.append(msgs)
        proof.level_evals.append(evals.copy())
        transcript.append(evals.ravel())
        mu = np.array(transcript.sample_ext(), np.uint64)
        e = 0
        new_prod, new_logup = [], []
        for s in range(n_prod):
            new_prod.append(_fold_two(evals[e], evals[e + 1], mu))
            e += 2
        for s in range(n_logup):
            new_logup.append([
                _fold_two(evals[e], evals[e + 1], mu),
                _fold_two(evals[e + 2], evals[e + 3], mu),
            ])
            e += 4
        prod_claims, logup_claims = new_prod, new_logup
        rt = np.stack(chs[::-1] + [mu], axis=0)
    end_h = bb.np_from_monty(np.asarray(end_state)).astype(np.uint64)
    assert np.array_equal(end_h, transcript.state), (
        "fused tower duplex diverged from host transcript"
    )
    return rt, prod_claims, logup_claims
