"""Per-chip compilation, record inference, proving and verification.

Role mirror of the reference's per-chip pipeline (SURVEY.md §3.2): a compiled
chip = circuit expressions expanded ONCE into monomial terms (like
``ZerocheckLayer::build_static_expression``); per shard the prover
  1. evaluates record expressions over the committed witness on device
     (``build_main_witness`` mirror),
  2. proves their grand products / logup sums with the tower
     (``prove_tower_relation`` mirror),
  3. proves the main zerocheck at the tower's final point: all record claims
     (shape sel_eq*(rec-1) = claim-1) plus named zero constraints, batched
     with alpha powers (``prove_main_constraints`` mirror),
and hands the witness-column evaluations at the sumcheck's point to the PCS
opening stage. The verifier replays everything on host, evaluating selector
and structural columns analytically (SelectorType::Prefix mirror).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import babybear as bb
from ..fields import ext4
from ..fields import ext4_host as exth
from ..hash.transcript import Transcript
from ..mle import expression as E
from ..mle import ops
from ..sumcheck import prover as sc_prover
from ..sumcheck import verifier as sc_verifier
from ..sumcheck.prover import TermSpec
from ..utils import aotcache as aot
from . import tower
from .circuit_builder import CircuitBuilder, StructuralSpec


# ---------------------------------------------------------------------------
# Compilation
# ---------------------------------------------------------------------------

@dataclass
class Slot:
    kind: str  # 'prod_r' | 'prod_w' | 'lkq' | 'lkp_table' | 'zero'
    name: str
    terms: list  # list[E.Term]
    rec: int = -1  # record index within the interleaved category


@dataclass
class CompiledChip:
    name: str
    n_wit: int
    n_fixed: int
    structural: list  # list[StructuralSpec]
    r_exprs: list
    w_exprs: list
    lk_exprs: list
    lk_table: list
    slots: list  # main-sumcheck slots in canonical order
    _builder_cache: dict = field(default_factory=dict)

    @property
    def n_cols(self):
        return self.n_wit + self.n_fixed + len(self.structural)


def _col_index(ref, n_wit, n_fixed):
    kind, idx = ref
    if kind == E.WIT:
        return idx
    if kind == E.FIXED:
        return n_wit + idx
    return n_wit + n_fixed + idx


def compile_chip(cb: CircuitBuilder) -> CompiledChip:
    slots = []
    n_lk = len(cb.lk_records)
    for i, rec in enumerate(cb.r_records):
        slots.append(Slot("prod_r", f"r{i}", E.to_terms(rec - 1), i))
    for i, rec in enumerate(cb.w_records):
        slots.append(Slot("prod_w", f"w{i}", E.to_terms(rec - 1), i))
    for i, rec in enumerate(cb.lk_records):
        slots.append(Slot("lkq", f"lk{i}", E.to_terms(rec - 1), i))
    for i, (mult, rec) in enumerate(cb.lk_table):
        slots.append(Slot("lkp_table", f"lkt_p{i}", E.to_terms(E.Neg(mult)), n_lk + i))
        slots.append(Slot("lkq", f"lkt_q{i}", E.to_terms(rec - 1), n_lk + i))
    for name, expr in cb.zeros:
        slots.append(Slot("zero", name, E.to_terms(expr)))
    return CompiledChip(
        cb.name,
        len(cb.wit_names),
        len(cb.fixed_names),
        list(cb.structural),
        list(cb.r_records),
        list(cb.w_records),
        list(cb.lk_records),
        list(cb.lk_table),
        slots,
    )


# ---------------------------------------------------------------------------
# Structural column materialization + analytic evaluation
# ---------------------------------------------------------------------------

def structural_table(spec: StructuralSpec, n: int,
                     instances=None) -> np.ndarray:
    """Canonical values of a structural column of length n (host).
    See StructuralSpec for the variant semantics (StructuralWitInType
    mirror); ``instances`` supplies the public values for the dynamic
    variant."""
    p = np.uint64(bb.P)
    i = np.arange(n, dtype=np.uint64)
    if spec.kind in ("incremental", "incremental_dynamic"):
        start = (
            int(np.asarray(instances, np.uint64)[spec.start])
            if spec.kind == "incremental_dynamic" else spec.start
        ) % bb.P
        stepped = spec.step % bb.P * i % p
        if spec.descending:
            return (np.uint64(start) + p - stepped) % p
        return (np.uint64(start) + stepped) % p
    if spec.kind == "stacked_incremental":
        # i - 2^floor(log2 i): floor-log2 exactly via bit_length
        out = np.zeros(n, np.uint64)
        bl = np.frompyfunc(lambda x: int(x).bit_length() - 1, 1, 1)(i[1:])
        out[1:] = (i[1:] - (np.uint64(1) << bl.astype(np.uint64))) % p
        return out
    if spec.kind == "stacked_constant":
        out = np.zeros(n, np.uint64)
        bl = np.frompyfunc(lambda x: int(x).bit_length() - 1, 1, 1)(i[1:])
        out[1:] = bl.astype(np.uint64) % p
        return out
    if spec.kind == "inner_repeat":
        return (i >> np.uint64(spec.k)) % p
    if spec.kind == "outer_repeat":
        return (i & np.uint64((1 << spec.k) - 1)) % p
    if spec.kind == "empty":
        return np.zeros(n, np.uint64)
    raise ValueError(f"unknown structural kind {spec.kind}")


def _wellform_eval(point: np.ndarray, offset: int, step: int,
                   descending: bool) -> np.ndarray:
    """offset +- step * (sum_j point[j] * 2^j) — the incremental MLE."""
    acc = np.zeros(4, np.uint64)
    for j in range(point.shape[0]):
        w = step % bb.P * pow(2, j, bb.P) % bb.P
        acc = exth.add(acc, exth.mul_base(point[j], np.uint64(w)))
    if descending:
        acc = exth.sub(exth.from_base(0), acc)
    return exth.add(exth.from_base(offset % bb.P), acc)


def structural_eval(spec: StructuralSpec, point: np.ndarray,
                    instances=None) -> np.ndarray:
    """Analytic MLE eval of a structural column at canonical point (n, 4)
    (verifier side — no PCS opening needed)."""
    point = np.asarray(point, np.uint64)
    if spec.kind in ("incremental", "incremental_dynamic"):
        start = (
            int(np.asarray(instances, np.uint64)[spec.start])
            if spec.kind == "incremental_dynamic" else spec.start
        )
        return _wellform_eval(point, start, spec.step, spec.descending)
    if spec.kind == "inner_repeat":
        return _wellform_eval(point[spec.k:], 0, 1, False)
    if spec.kind == "outer_repeat":
        return _wellform_eval(point[: spec.k], 0, 1, False)
    one = exth.one()
    if spec.kind == "stacked_incremental":
        acc = np.zeros(4, np.uint64)
        for j in range(1, point.shape[0]):
            inner = _wellform_eval(point[:j], 0, 1, False)
            acc = exth.add(
                exth.mul(acc, exth.sub(one, point[j])),
                exth.mul(inner, point[j]),
            )
        return acc
    if spec.kind == "stacked_constant":
        acc = np.zeros(4, np.uint64)
        for j in range(1, point.shape[0]):
            acc = exth.add(
                exth.mul(acc, exth.sub(one, point[j])),
                exth.mul_base(point[j], np.uint64(j % bb.P)),
            )
        return acc
    if spec.kind == "empty":
        return np.zeros(4, np.uint64)
    raise ValueError(f"unknown structural kind {spec.kind}")


def sel_prefix_sum(point: np.ndarray, k: int) -> np.ndarray:
    """sum_{x < k} eq(point, x): MLE eval of the prefix selector (host)."""
    n = point.shape[0]
    one = exth.one()
    if k >= (1 << n):  # full selector: sum of eq over the whole cube is 1
        return one
    result = np.zeros(4, np.uint64)
    prefix = one
    for j in range(n - 1, -1, -1):
        pj = point[j].astype(np.uint64)
        b0 = exth.sub(one, pj)
        if (k >> j) & 1:
            # x_j = 0 branch fully below k: lower bits free sum to 1
            result = exth.add(result, exth.mul(prefix, b0))
            prefix = exth.mul(prefix, pj)
        else:
            prefix = exth.mul(prefix, b0)
    return result


def sel_eq_eval(rt: np.ndarray, point: np.ndarray, k: int) -> np.ndarray:
    """sum_{x < k} eq(rt, x) * eq(point, x): MLE of the masked-eq column."""
    n = point.shape[0]
    rt = rt.astype(np.uint64)
    point = point.astype(np.uint64)
    if k >= (1 << n):  # unmasked: reduces to eq(rt, point)
        return exth.eq_eval(rt, point)
    one = exth.one()
    a = [
        exth.add(
            exth.mul(rt[j], point[j]),
            exth.mul(exth.sub(one, rt[j]), exth.sub(one, point[j])),
        )
        for j in range(n)
    ]
    lower = [one]
    for j in range(n):
        lower.append(exth.mul(lower[-1], a[j]))  # lower[j] = prod_{l<j} a_l
    result = np.zeros(4, np.uint64)
    prefix = one
    for j in range(n - 1, -1, -1):
        b0 = exth.mul(exth.sub(one, rt[j]), exth.sub(one, point[j]))
        b1 = exth.mul(rt[j], point[j])
        if (k >> j) & 1:
            result = exth.add(result, exth.mul(exth.mul(prefix, b0), lower[j]))
            prefix = exth.mul(prefix, b1)
        else:
            prefix = exth.mul(prefix, b0)
    return result


# ---------------------------------------------------------------------------
# Device record inference (expression evaluation over trace banks)
# ---------------------------------------------------------------------------

def _eval_expr(expr, ctx, memo):
    key = id(expr)
    if key in memo:
        return memo[key]
    wit, fixed, structural, inst, chals = ctx
    if isinstance(expr, E.Wit):
        out = ("b", wit[expr.idx])
    elif isinstance(expr, E.Fix):
        out = ("b", fixed[expr.idx])
    elif isinstance(expr, E.Structural):
        out = ("b", structural[expr.idx])
    elif isinstance(expr, E.Const):
        out = ("b", jnp.full((), bb.const(expr.value), bb.DTYPE))
    elif isinstance(expr, E.ExtConst):
        out = ("e", jnp.array([bb.const(v) for v in expr.value], bb.DTYPE).reshape(4, 1))
    elif isinstance(expr, E.Challenge):
        out = ("e", chals[expr.cid][:, None])
    elif isinstance(expr, E.ChallengePow):
        pkey = ("chalpow", expr.cid, expr.power)
        if pkey not in memo:
            cur = chals[expr.cid][:, None]
            for _ in range(expr.power - 1):
                cur = ext4.mul(cur, chals[expr.cid][:, None])
            # cache every intermediate power for sharing across records
            memo[pkey] = ("e", cur)
        out = memo[pkey]
    elif isinstance(expr, E.Instance):
        out = ("b", inst[expr.idx])
    elif isinstance(expr, E.Neg):
        k, v = _eval_expr(expr.inner, ctx, memo)
        out = (k, bb.neg(v))
    elif isinstance(expr, E.Sum):
        k, v = _eval_expr(expr.terms[0], ctx, memo)
        for t in expr.terms[1:]:
            k2, v2 = _eval_expr(t, ctx, memo)
            k, v = _combine_add(k, v, k2, v2)
        out = (k, v)
    elif isinstance(expr, E.Prod):
        k, v = _eval_expr(expr.factors[0], ctx, memo)
        for f in expr.factors[1:]:
            k2, v2 = _eval_expr(f, ctx, memo)
            k, v = _combine_mul(k, v, k2, v2)
        out = (k, v)
    else:
        raise TypeError(type(expr))
    memo[key] = out
    return out


def _promote(v):
    z = jnp.zeros_like(v)
    return jnp.stack([v, z, z, z])


def _combine_add(k1, v1, k2, v2):
    if k1 == "b" and k2 == "b":
        return "b", bb.add(v1, v2)
    if k1 == "b":
        v1 = _promote(v1)
    if k2 == "b":
        v2 = _promote(v2)
    return "e", ext4.add(v1, v2)


def _combine_mul(k1, v1, k2, v2):
    if k1 == "b" and k2 == "b":
        return "b", bb.mul(v1, v2)
    if k1 == "b":
        return "e", ext4.mul_base(v2, v1)
    if k2 == "b":
        return "e", ext4.mul_base(v1, v2)
    return "e", ext4.mul(v1, v2)


def _as_ext_n(kind, v, n):
    if kind == "b":
        v = _promote(v)
    if v.shape[-1] != n:
        v = jnp.broadcast_to(v[..., :1], (4, n))
    return v


def interleave_geometry(compiled: CompiledChip):
    """(rho, R_r, R_w, R_l): shared record-index bits for the interleaved
    towers (records are stacked record-major on TOP of the row bits, padded
    to 2^rho per category — the reference's record interleaving,
    scheme/utils.rs interleaving_mles_to_mles)."""
    r_r = len(compiled.r_exprs)
    r_w = len(compiled.w_exprs)
    r_l = len(compiled.lk_exprs) + len(compiled.lk_table)
    rho = max(
        (max(r, 1) - 1).bit_length() for r in (r_r, r_w, r_l)
    )
    return rho, r_r, r_w, r_l


def build_records_from_sel(compiled: CompiledChip, wit, fixed, structural,
                           inst, chals, sel):
    """Record inference core given an explicit selector column (Monty 0/1).

    Shared by the single-device builder (sel = [iota < k]) and the mesh
    shard_map wrapper (sel from the device's global row indices)."""
    rho, r_r, r_w, r_l = interleave_geometry(compiled)
    n = wit.shape[1] if compiled.n_wit else structural.shape[1]
    ctx = (wit, fixed, structural, inst, chals)
    memo = {}

    def padded(expr):
        k, v = _eval_expr(expr, ctx, memo)
        v = _as_ext_n(k, v, n)
        one = jnp.full((), bb.MONTY_ONE, bb.DTYPE)
        rec_m1 = v.at[0].set(bb.sub(v[0], one))
        out = ext4.mul_base(rec_m1, sel)
        return out.at[0].set(bb.add(out[0], one))

    def stack(recs, pad_one: bool):
        pad_count = (1 << rho) - len(recs)
        if pad_count:
            padv = ext4.ones((pad_count * n,)) if pad_one else ext4.zeros((pad_count * n,))
            recs = recs + [padv]
        return jnp.concatenate(recs, axis=-1)

    mr = stack([padded(e) for e in compiled.r_exprs], True) if r_r else None
    mw = stack([padded(e) for e in compiled.w_exprs], True) if r_w else None
    if r_l:
        ps, qs = [], []
        for e in compiled.lk_exprs:
            ps.append(_promote(sel))
            qs.append(padded(e))
        # hold the Neg temporaries alive for the whole loop: the memo is
        # id()-keyed, and a freed temp's address can be REUSED by the next
        # iteration's Neg, silently returning the previous record's value
        neg_mults = [E.Neg(mult) for mult, _ in compiled.lk_table]
        for nm, (mult, rec) in zip(neg_mults, compiled.lk_table):
            k, v = _eval_expr(nm, ctx, memo)
            v = _as_ext_n(k, v, n)
            ps.append(ext4.mul_base(v, sel))
            qs.append(padded(rec))
        p = stack(ps, False)
        q = stack(qs, True)
    else:
        p = q = None
    return mr, mw, p, q


def chip_digest(compiled: CompiledChip) -> str:
    """Stable digest of a chip's full constraint structure (expression nodes
    are frozen dataclasses, so repr is deterministic). Keys the AOT
    executable cache for per-chip closure programs."""
    import hashlib

    r = repr((compiled.name, compiled.n_wit, compiled.n_fixed,
              compiled.structural, compiled.r_exprs, compiled.w_exprs,
              compiled.lk_exprs, compiled.lk_table, compiled.slots))
    return hashlib.sha256(r.encode()).hexdigest()[:16]


def make_record_builder(compiled: CompiledChip):
    """Jitted fn: (wit, fixed, structural, inst, chals, num_instances) ->
    (Mr, Mw, P, Q) interleaved record MLEs of size 2^rho * N each (or None
    for absent categories). Padding: products 1, logup p 0, logup q 1."""
    rho, r_r, r_w, r_l = interleave_geometry(compiled)

    def build(wit, fixed, structural, inst, chals, num_instances):
        n = wit.shape[1] if compiled.n_wit else structural.shape[1]
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
        sel = jnp.where(iota < num_instances, jnp.uint32(bb.MONTY_ONE), jnp.uint32(0))
        return build_records_from_sel(
            compiled, wit, fixed, structural, inst, chals, sel
        )

    return aot.wrap(build, key=f"records:{chip_digest(compiled)}")


# ---------------------------------------------------------------------------
# Chip proof
# ---------------------------------------------------------------------------

import os as _os

HOST_CHIP_N = int(_os.environ.get("CENO_TPU_HOST_N", 1 << 12))


def _to_dev(x: np.ndarray):
    return jnp.asarray(bb.np_to_monty(np.asarray(x, np.uint64).astype(np.uint32)))


def _build_records_host(compiled, wit, fixed, structural, instances, challenges,
                        k: int, n: int):
    """Host mirror of make_record_builder: canonical numpy tower inputs."""
    from .mock import eval_expr_host

    p = np.uint64(bb.P)
    sel = (np.arange(n) < k).astype(np.uint64)
    memo = {}

    def to_ext(kind, v):
        if kind == "b":
            vv = np.broadcast_to(np.atleast_1d(np.asarray(v, np.uint64)), (n,))
            out = np.zeros((n, 4), np.uint64)
            out[:, 0] = vv % p
            return out
        v = np.asarray(v, np.uint64)
        if v.ndim == 1:  # challenge-only scalar ext
            v = np.broadcast_to(v, (n, 4))
        return v.copy()

    def padded(expr):
        kind, v = eval_expr_host(expr, wit, fixed, structural, instances, challenges, memo)
        v = to_ext(kind, v)
        v[:, 0] = (v[:, 0] + p - 1) % p
        v = v * sel[:, None] % p
        v[:, 0] = (v[:, 0] + 1) % p
        return v

    rho, r_r, r_w, r_l = interleave_geometry(compiled)

    def stack(recs, pad_one: bool):
        pad_count = (1 << rho) - len(recs)
        if pad_count:
            padv = np.zeros((pad_count * n, 4), np.uint64)
            if pad_one:
                padv[:, 0] = 1
            recs = recs + [padv]
        return np.concatenate(recs, axis=0)

    mr = stack([padded(e) for e in compiled.r_exprs], True) if r_r else None
    mw = stack([padded(e) for e in compiled.w_exprs], True) if r_w else None
    if r_l:
        ps, qs = [], []
        for e in compiled.lk_exprs:
            pcol = np.zeros((n, 4), np.uint64)
            pcol[:, 0] = sel
            ps.append(pcol)
            qs.append(padded(e))
        from ..mle import expression as E

        # keep the Neg temps alive: the eval memo is id()-keyed (see the
        # device builder above)
        neg_mults = [E.Neg(mult) for mult, _ in compiled.lk_table]
        for nm, (mult, rec) in zip(neg_mults, compiled.lk_table):
            kind, v = eval_expr_host(nm, wit, fixed, structural, instances, challenges, memo)
            v = to_ext(kind, v)
            v = v * sel[:, None] % p
            ps.append(v)
            qs.append(padded(rec))
        pcat = stack(ps, False)
        qcat = stack(qs, True)
    else:
        pcat = qcat = None
    return mr, mw, pcat, qcat


@dataclass
class ChipProof:
    num_instances: int
    n_vars: int
    tower_proof: tower.TowerProof
    main_msgs: np.ndarray
    wit_evals: np.ndarray        # (n_wit, 4) at main point
    fixed_evals: np.ndarray      # (n_fixed, 4)
    structural_evals: np.ndarray  # (n_structural, 4)


@dataclass
class ChipOpening:
    """Claims handed to the PCS stage."""

    point: np.ndarray       # (n_vars, 4) canonical
    wit_evals: np.ndarray   # (n_wit, 4)
    fixed_evals: np.ndarray


def prove_chip(
    compiled: CompiledChip,
    wit_dev,          # (n_wit, N) device Monty
    fixed_dev,        # (n_fixed, N)
    structural_dev,   # (n_struct, N)
    instances: np.ndarray,  # canonical public values (host)
    num_instances: int,
    challenges: np.ndarray,  # (2, 4) canonical alpha, beta
    transcript: Transcript,
):
    from ..utils import spans

    n = wit_dev.shape[1]
    n_vars = n.bit_length() - 1
    use_host = n <= HOST_CHIP_N and isinstance(wit_dev, np.ndarray)
    if use_host:
        mr, mw, pcat, qcat = _build_records_host(
            compiled, wit_dev, fixed_dev, structural_dev, instances,
            challenges, num_instances, n,
        )
    else:
        if isinstance(wit_dev, np.ndarray):
            wit_dev, fixed_dev, structural_dev = (
                _to_dev(wit_dev), _to_dev(fixed_dev), _to_dev(structural_dev)
            )
        builder = compiled._builder_cache.get("rb")
        if builder is None:
            builder = make_record_builder(compiled)
            compiled._builder_cache["rb"] = builder
        chals_dev = jnp.asarray(bb.np_to_monty(challenges))
        inst_dev = jnp.asarray(
            bb.np_to_monty(np.asarray(instances, np.uint64).astype(np.uint32))
        )
        mr, mw, pcat, qcat = builder(
            wit_dev, fixed_dev, structural_dev, inst_dev, chals_dev, num_instances
        )
    prods = [m for m in (mr, mw) if m is not None]
    lps = [(pcat, qcat)] if pcat is not None else []
    assert prods or lps, f"{compiled.name}: chip has no records"
    with spans.span("towers"):
        tower_proof, rt, (prod_claims, logup_claims) = tower.prove_towers(
            prods, lps, transcript
        )

    x_star = rt[:n_vars]
    b_star = rt[n_vars:]
    mults, _meta = _slot_multipliers(compiled, b_star, transcript)
    # masked eq column sel_eq = eq(x*, .) * [row < num_instances]
    if use_host:
        from ..sumcheck import host_impl as H

        sel_eq = H.build_eq_host(x_star)
        sel_eq[num_instances:] = 0
    else:
        sel_eq = _masked_eq(jnp.asarray(bb.np_to_monty(x_star)), num_instances, n)

    with spans.span("term-setup"):
        term_list = []
        for i, slot in enumerate(compiled.slots):
            for t in slot.terms:
                sc = exth.mul(
                    mults[i], E.eval_scalar(t.scalar, challenges, instances)
                )
                bidx = tuple(
                    _col_index(c, compiled.n_wit, compiled.n_fixed) for c in t.cols
                )
                term_list.append(TermSpec(sc, bidx=bidx, eidx=(0,)))

    base_cols = (
        [wit_dev[i] for i in range(compiled.n_wit)]
        + [fixed_dev[i] for i in range(compiled.n_fixed)]
        + [structural_dev[i] for i in range(len(compiled.structural))]
    )
    with spans.span("main-zerocheck"):
        out = sc_prover.prove(base_cols, [sel_eq], term_list, n_vars, transcript)
    transcript.append(out.final_base.ravel())

    wit_evals = out.final_base[: compiled.n_wit]
    fixed_evals = out.final_base[compiled.n_wit : compiled.n_wit + compiled.n_fixed]
    structural_evals = out.final_base[compiled.n_wit + compiled.n_fixed :]
    proof = ChipProof(
        num_instances, n_vars, tower_proof, out.proof.round_msgs,
        wit_evals, fixed_evals, structural_evals,
    )
    opening = ChipOpening(out.point, wit_evals, fixed_evals)
    return proof, opening


def _slot_multipliers(compiled: CompiledChip, b_star: np.ndarray, transcript):
    """Sample the main-sumcheck batching alphas and derive per-slot scalar
    multipliers: record slots get alpha_cat * eq(b*, rec) (the interleaved
    claim decomposes as M(rt) = sum_r eq(b*, r) * P_r(x*)); zero-constraint
    slots get their own alpha. Returns (mults per slot, meta dict)."""
    from ..sumcheck import host_impl as H

    rho, r_r, r_w, r_l = interleave_geometry(compiled)
    n_zero = sum(1 for s in compiled.slots if s.kind == "zero")
    has_r, has_w, has_l = r_r > 0, r_w > 0, r_l > 0
    n_alpha = int(has_r) + int(has_w) + 2 * int(has_l) + n_zero
    alphas = transcript.sample_ext_pows(n_alpha)
    w = H.build_eq_host(np.asarray(b_star, np.uint64))  # (2^rho, 4)
    ai = 0
    meta = {"w": w}
    for key, flag in (("a_r", has_r), ("a_w", has_w)):
        meta[key] = alphas[ai] if flag else None
        ai += int(flag)
    if has_l:
        meta["a_p"] = alphas[ai]
        meta["a_q"] = alphas[ai + 1]
        ai += 2
    else:
        meta["a_p"] = meta["a_q"] = None
    zero_base = ai
    mults = []
    zi = 0
    for s in compiled.slots:
        if s.kind == "prod_r":
            mults.append(exth.mul(meta["a_r"], w[s.rec]))
        elif s.kind == "prod_w":
            mults.append(exth.mul(meta["a_w"], w[s.rec]))
        elif s.kind == "lkq":
            mults.append(exth.mul(meta["a_q"], w[s.rec]))
        elif s.kind == "lkp_table":
            mults.append(exth.mul(meta["a_p"], w[s.rec]))
        else:
            mults.append(alphas[zero_base + zi])
            zi += 1
    return mults, meta


@aot.jit(static_argnames=("n",))
def _masked_eq(rt, num_instances, n: int):
    eq = ops.build_eq(rt)
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    return jnp.where(iota[None, :] < num_instances, eq, jnp.uint32(0))


class ChipError(Exception):
    pass


# ---------------------------------------------------------------------------
# Class-batched main zerocheck (cross-chip batching)
#
# Role mirror of the reference's batched main constraints
# (ceno_zkvm/src/scheme/cpu/mod.rs:1043-1392): instead of one main sumcheck
# per chip, all chips of one height class run ONE batched zerocheck. Per-chip
# towers stay as today (each absorbs its proof and samples its slot alphas on
# the shared transcript); after ALL towers of the class are bound, the class
# samples fresh gamma powers (one per chip) and proves
#     sum_i gamma_i * sel_eq_i(x) * (sum_slot mult_slot * slot_expr_i(x)) = claim
# in a single sumcheck over the class's n_vars. Every chip in the class then
# opens its witness columns at the SAME point — the PCS batch gets one main
# point per height class (the reference's "per-chip opening point =
# global_rt[..chip_num_vars]", cpu/mod.rs:1365-1380, adapted to height
# classes, which is the TPU-natural same-shape batching unit).
# ---------------------------------------------------------------------------


@dataclass
class _TowerInputs:
    """Per-chip record MLEs waiting for the grouped tower stage."""

    compiled: CompiledChip
    num_instances: int
    n_vars: int
    use_host: bool
    wit_dev: object
    fixed_dev: object
    structural_dev: object
    prods: list        # [(4, N_t) device Monty] or [(N_t, 4) host canonical]
    lps: list          # [(p, q)] same convention
    n_tower: int       # N_t = n << rho (the grouping key)


@dataclass
class ClassMainProof:
    """One batched main zerocheck for all chips of a height class."""

    main_msgs: np.ndarray          # (n_vars, deg+1, 4)
    wit_evals: list                # per chip (class order): (n_wit, 4)
    fixed_evals: list              # per chip: (n_fixed, 4)
    structural_evals: list         # per chip: (n_struct, 4)


@dataclass
class _TowerCtx:
    """Prover-side state between a chip's tower and its class's main stage."""

    compiled: CompiledChip
    num_instances: int
    n_vars: int
    use_host: bool
    wit_dev: object
    fixed_dev: object
    structural_dev: object
    x_star: np.ndarray
    mults: list


def build_tower_inputs(
    compiled: CompiledChip,
    wit_dev,
    fixed_dev,
    structural_dev,
    instances: np.ndarray,
    num_instances: int,
    challenges: np.ndarray,
) -> _TowerInputs:
    """Record inference for one chip (stage 1a of the class-batched prove).
    No transcript interaction — the records wait for the grouped tower."""
    n = wit_dev.shape[1]
    n_vars = n.bit_length() - 1
    use_host = n <= HOST_CHIP_N and isinstance(wit_dev, np.ndarray)
    if use_host:
        mr, mw, pcat, qcat = _build_records_host(
            compiled, wit_dev, fixed_dev, structural_dev, instances,
            challenges, num_instances, n,
        )
    else:
        if isinstance(wit_dev, np.ndarray):
            wit_dev, fixed_dev, structural_dev = (
                _to_dev(wit_dev), _to_dev(fixed_dev), _to_dev(structural_dev)
            )
        builder = compiled._builder_cache.get("rb")
        if builder is None:
            builder = make_record_builder(compiled)
            compiled._builder_cache["rb"] = builder
        chals_dev = jnp.asarray(bb.np_to_monty(challenges))
        inst_dev = jnp.asarray(
            bb.np_to_monty(np.asarray(instances, np.uint64).astype(np.uint32))
        )
        mr, mw, pcat, qcat = builder(
            wit_dev, fixed_dev, structural_dev, inst_dev, chals_dev, num_instances
        )
    prods = [m for m in (mr, mw) if m is not None]
    lps = [(pcat, qcat)] if pcat is not None else []
    assert prods or lps, f"{compiled.name}: chip has no records"
    rho, _, _, _ = interleave_geometry(compiled)
    return _TowerInputs(
        compiled, num_instances, n_vars, use_host,
        wit_dev, fixed_dev, structural_dev, prods, lps, n << rho,
    )


def _rec_to_dev(r: np.ndarray):
    """Host (N, 4) canonical record -> device (4, N) Monty."""
    return jnp.asarray(
        bb.np_to_monty(np.ascontiguousarray(r.T).astype(np.uint32))
    )


def prove_group_towers(inputs: list, transcript: Transcript):
    """Stage 1b: ONE tower prove for all chips whose interleaved record tree
    has the same size N_t = n << rho (P3 chip parallelism by batching — the
    per-level sumchecks run once per group instead of once per chip,
    scheduler.rs:49-155 role). The final point rt is shared; each chip splits
    it per its own geometry (x* = rt[:n_vars], b* = rt[n_vars:]). Per-chip
    slot-multiplier challenges are sampled after the group tower, in chip
    order. Returns (tower.TowerProof, [_TowerCtx])."""
    from ..utils import spans

    any_dev = any(not ti.use_host for ti in inputs)
    prods, lps = [], []
    for ti in inputs:
        p_i, l_i = ti.prods, ti.lps
        if any_dev and ti.use_host:
            p_i = [_rec_to_dev(r) for r in p_i]
            l_i = [(_rec_to_dev(p), _rec_to_dev(q)) for p, q in l_i]
        prods += p_i
        lps += l_i
    with spans.span(f"towers/2^{inputs[0].n_tower.bit_length() - 1}"):
        tower_proof, rt, _claims = tower.prove_towers(prods, lps, transcript)
    ctxs = []
    for ti in inputs:
        x_star = rt[: ti.n_vars]
        b_star = rt[ti.n_vars :]
        mults, _meta = _slot_multipliers(ti.compiled, b_star, transcript)
        ctxs.append(_TowerCtx(
            ti.compiled, ti.num_instances, ti.n_vars, ti.use_host,
            ti.wit_dev, ti.fixed_dev, ti.structural_dev, x_star, mults,
        ))
    return tower_proof, ctxs


def prove_class_main(
    ctxs: list,
    instances: np.ndarray,
    challenges: np.ndarray,
    transcript: Transcript,
):
    """Stage 2: one batched zerocheck for all chips of one height class.

    Returns (ClassMainProof, [ChipOpening per chip in ctx order])."""
    from ..utils import spans

    n_vars = ctxs[0].n_vars
    assert all(c.n_vars == n_vars for c in ctxs)
    use_host = all(c.use_host for c in ctxs)
    n = 1 << n_vars
    gammas = transcript.sample_ext_pows(len(ctxs))

    base_cols = []
    ext_cols = []
    term_list = []
    col_base = 0
    for i, ctx in enumerate(ctxs):
        compiled = ctx.compiled
        if use_host:
            from ..sumcheck import host_impl as H

            sel_eq = H.build_eq_host(ctx.x_star)
            sel_eq[ctx.num_instances:] = 0
        else:
            sel_eq = _masked_eq(
                jnp.asarray(bb.np_to_monty(ctx.x_star)), ctx.num_instances, n
            )
        ext_cols.append(sel_eq)
        for si, slot in enumerate(compiled.slots):
            g_mult = exth.mul(gammas[i], ctx.mults[si])
            for tm in slot.terms:
                sc = exth.mul(g_mult, E.eval_scalar(tm.scalar, challenges, instances))
                bidx = tuple(
                    col_base + _col_index(c, compiled.n_wit, compiled.n_fixed)
                    for c in tm.cols
                )
                term_list.append(TermSpec(sc, bidx=bidx, eidx=(i,)))
        base_cols += (
            [ctx.wit_dev[j] for j in range(compiled.n_wit)]
            + [ctx.fixed_dev[j] for j in range(compiled.n_fixed)]
            + [ctx.structural_dev[j] for j in range(len(compiled.structural))]
        )
        col_base += compiled.n_cols

    with spans.span(f"main-zerocheck/2^{n_vars}"):
        out = sc_prover.prove(base_cols, ext_cols, term_list, n_vars, transcript)
    transcript.append(out.final_base.ravel())

    wit_evals, fixed_evals, structural_evals, openings = [], [], [], []
    off = 0
    for ctx in ctxs:
        compiled = ctx.compiled
        we = out.final_base[off : off + compiled.n_wit]
        fe = out.final_base[off + compiled.n_wit : off + compiled.n_wit + compiled.n_fixed]
        se = out.final_base[
            off + compiled.n_wit + compiled.n_fixed : off + compiled.n_cols
        ]
        off += compiled.n_cols
        wit_evals.append(we)
        fixed_evals.append(fe)
        structural_evals.append(se)
        openings.append(ChipOpening(out.point, we, fe))
    proof = ClassMainProof(out.proof.round_msgs, wit_evals, fixed_evals, structural_evals)
    return proof, openings


@dataclass
class _VerifyCtx:
    """Verifier-side state between a chip's tower and the class main check."""

    compiled: CompiledChip
    num_instances: int
    n_vars: int
    x_star: np.ndarray
    mults: list
    batched_claim: np.ndarray
    main_deg: int


def verify_group_towers(
    entries: list,
    group_proof: tower.TowerProof,
    instances: np.ndarray,
    challenges: np.ndarray,
    transcript: Transcript,
):
    """Stage 1 of the class-batched verify: ONE tower verification for every
    chip of one tower-size group (mirrors prove_group_towers).

    ``entries``: [(compiled, num_instances, n_vars)] in group chip order.
    Returns [(_VerifyCtx, prod_values (S_p_i, 4), logup_fracs (S_l_i, 2, 4))
    per chip]. Raises ChipError if the proof's spec count does not match the
    group geometry."""
    geo = [interleave_geometry(e[0]) for e in entries]
    n_tower_vars = entries[0][2] + geo[0][0]
    for (compiled, k, n_vars), (rho, _, _, _) in zip(entries, geo):
        if n_vars + rho != n_tower_vars:
            raise ChipError(f"{compiled.name}: tower group size mismatch")
    rt, prod_claims, logup_claims, prod_values, logup_fracs = tower.verify_towers(
        group_proof, n_tower_vars, transcript
    )
    out = []
    pi = li = 0
    one = exth.one()
    for (compiled, k, n_vars), (rho, r_r, r_w, r_l) in zip(entries, geo):
        n_lk = len(compiled.lk_exprs)
        x_star = rt[:n_vars]
        b_star = rt[n_vars:]
        mults, meta = _slot_multipliers(compiled, b_star, transcript)
        w = meta["w"]

        batched = np.zeros(4, np.uint64)
        chip_prod_values = []
        if r_r:
            batched = exth.add(
                batched, exth.mul(meta["a_r"], exth.sub(prod_claims[pi], one))
            )
            chip_prod_values.append(prod_values[pi])
            pi += 1
        if r_w:
            batched = exth.add(
                batched, exth.mul(meta["a_w"], exth.sub(prod_claims[pi], one))
            )
            chip_prod_values.append(prod_values[pi])
            pi += 1
        chip_logup_fracs = np.zeros((0, 2, 4), np.uint64)
        if r_l:
            sel_v = sel_prefix_sum(x_star, k)
            w_chip = np.zeros(4, np.uint64)
            for i in range(n_lk):
                w_chip = exth.add(w_chip, w[i])
            p_claim = exth.sub(logup_claims[li][0], exth.mul(sel_v, w_chip))
            batched = exth.add(batched, exth.mul(meta["a_p"], p_claim))
            batched = exth.add(
                batched, exth.mul(meta["a_q"], exth.sub(logup_claims[li][1], one))
            )
            chip_logup_fracs = logup_fracs[li : li + 1]
            li += 1
        main_deg = max(
            (len(t.cols) + 1 for s in compiled.slots for t in s.terms), default=1
        )
        ctx = _VerifyCtx(compiled, k, n_vars, x_star, mults, batched, main_deg)
        out.append((
            ctx,
            np.stack(chip_prod_values)
            if chip_prod_values else np.zeros((0, 4), np.uint64),
            chip_logup_fracs,
        ))
    if pi != prod_values.shape[0] or li != logup_fracs.shape[0]:
        raise ChipError("tower group spec count mismatch")
    return out


def verify_class_main(
    vctxs: list,
    class_proof: ClassMainProof,
    instances: np.ndarray,
    challenges: np.ndarray,
    transcript: Transcript,
):
    """Stage 2 of the class-batched verify. Returns [ChipOpening per chip]."""
    n_vars = vctxs[0].n_vars
    if any(v.n_vars != n_vars for v in vctxs):
        raise ChipError("class members disagree on n_vars")
    if (
        len(class_proof.wit_evals) != len(vctxs)
        or len(class_proof.fixed_evals) != len(vctxs)
        or len(class_proof.structural_evals) != len(vctxs)
    ):
        raise ChipError("class proof eval count mismatch")
    gammas = transcript.sample_ext_pows(len(vctxs))
    combined = np.zeros(4, np.uint64)
    for g, v in zip(gammas, vctxs):
        combined = exth.add(combined, exth.mul(g, v.batched_claim))
    deg = max(v.main_deg for v in vctxs)
    point, final_claim = sc_verifier.verify(
        combined, class_proof.main_msgs, n_vars, transcript, deg=deg
    )
    flat = []
    for i, v in enumerate(vctxs):
        we = np.asarray(class_proof.wit_evals[i], np.uint64)
        fe = np.asarray(class_proof.fixed_evals[i], np.uint64)
        se = np.asarray(class_proof.structural_evals[i], np.uint64)
        if we.shape != (v.compiled.n_wit, 4) or fe.shape != (v.compiled.n_fixed, 4) \
                or se.shape != (len(v.compiled.structural), 4):
            raise ChipError(f"{v.compiled.name}: eval shape mismatch")
        flat += [we, fe, se]
    transcript.append(
        np.concatenate([x.reshape(-1) for x in flat])
        if flat else np.zeros(0, np.uint64)
    )

    total = np.zeros(4, np.uint64)
    openings = []
    for i, v in enumerate(vctxs):
        compiled = v.compiled
        we = np.asarray(class_proof.wit_evals[i], np.uint64)
        fe = np.asarray(class_proof.fixed_evals[i], np.uint64)
        se = np.asarray(class_proof.structural_evals[i], np.uint64)
        for j, spec in enumerate(compiled.structural):
            if not np.array_equal(se[j], structural_eval(spec, point, instances)):
                from ..utils import replay

                if not replay.structure_only():
                    raise ChipError(
                        f"{compiled.name}: structural column {j} eval mismatch"
                    )
        col_evals = (
            np.concatenate([we, fe, se], axis=0)
            if compiled.n_cols
            else np.zeros((0, 4), np.uint64)
        )
        acc = np.zeros(4, np.uint64)
        for si, slot in enumerate(compiled.slots):
            slot_val = np.zeros(4, np.uint64)
            for tm in slot.terms:
                val = E.eval_scalar(tm.scalar, challenges, instances)
                for c in tm.cols:
                    val = exth.mul(
                        val, col_evals[_col_index(c, compiled.n_wit, compiled.n_fixed)]
                    )
                slot_val = exth.add(slot_val, val)
            acc = exth.add(acc, exth.mul(v.mults[si], slot_val))
        s_eq = sel_eq_eval(v.x_star, point, v.num_instances)
        total = exth.add(total, exth.mul(gammas[i], exth.mul(s_eq, acc)))
        openings.append(ChipOpening(point, we, fe))
    if not np.array_equal(total, final_claim):
        from ..utils import replay

        if not replay.structure_only():
            raise ChipError("class main sumcheck recombination mismatch")
    return openings


def verify_chip(
    compiled: CompiledChip,
    proof: ChipProof,
    instances: np.ndarray,   # canonical public values
    challenges: np.ndarray,  # (2, 4) canonical
    transcript: Transcript,
):
    """Returns (opening: ChipOpening, prod_values (S_p,4), logup_fracs (S_l,2,4)).

    prod_values = [prod(reads)?, prod(writes)?] per present category;
    logup_fracs has one (p, q) fraction when the chip has lookups. Raises
    ChipError on any failure."""
    n_vars = proof.n_vars
    k = proof.num_instances
    rho, r_r, r_w, r_l = interleave_geometry(compiled)
    n_lk = len(compiled.lk_exprs)
    rt, prod_claims, logup_claims, prod_values, logup_fracs = tower.verify_towers(
        proof.tower_proof, n_vars + rho, transcript
    )
    x_star = rt[:n_vars]
    b_star = rt[n_vars:]
    mults, meta = _slot_multipliers(compiled, b_star, transcript)
    w = meta["w"]
    one = exth.one()

    batched = np.zeros(4, np.uint64)
    pi = 0
    if r_r:
        batched = exth.add(batched, exth.mul(meta["a_r"], exth.sub(prod_claims[pi], one)))
        pi += 1
    if r_w:
        batched = exth.add(batched, exth.mul(meta["a_w"], exth.sub(prod_claims[pi], one)))
        pi += 1
    if r_l:
        # chip-side lookup numerators are sel: p(rt) = sum_{chip recs} w_r * sel(x*)
        # + (table-side main terms); move the analytic part into the claim
        sel_v = sel_prefix_sum(x_star, k)
        w_chip = np.zeros(4, np.uint64)
        for i in range(n_lk):
            w_chip = exth.add(w_chip, w[i])
        p_claim = exth.sub(logup_claims[0][0], exth.mul(sel_v, w_chip))
        batched = exth.add(batched, exth.mul(meta["a_p"], p_claim))
        batched = exth.add(
            batched, exth.mul(meta["a_q"], exth.sub(logup_claims[0][1], one))
        )

    main_deg = max(
        (len(t.cols) + 1 for s in compiled.slots for t in s.terms), default=1
    )
    point, final_claim = sc_verifier.verify(
        batched, proof.main_msgs, n_vars, transcript, deg=main_deg
    )
    transcript.append(proof.wit_evals.ravel())
    transcript.append(proof.fixed_evals.ravel())
    transcript.append(proof.structural_evals.ravel())

    # structural evals must match their analytic values
    for i, spec in enumerate(compiled.structural):
        expect = structural_eval(spec, point, instances)
        if not np.array_equal(proof.structural_evals[i], expect):
            raise ChipError(f"{compiled.name}: structural column {i} eval mismatch")

    # recombination at the opening point
    col_evals = np.concatenate(
        [proof.wit_evals, proof.fixed_evals, proof.structural_evals], axis=0
    ) if compiled.n_cols else np.zeros((0, 4), np.uint64)
    s_eq = sel_eq_eval(x_star, point, k)
    acc = np.zeros(4, np.uint64)
    for i, slot in enumerate(compiled.slots):
        slot_val = np.zeros(4, np.uint64)
        for t in slot.terms:
            v = E.eval_scalar(t.scalar, challenges, instances)
            for c in t.cols:
                v = exth.mul(v, col_evals[_col_index(c, compiled.n_wit, compiled.n_fixed)])
            slot_val = exth.add(slot_val, v)
        acc = exth.add(acc, exth.mul(mults[i], slot_val))
    if not np.array_equal(exth.mul(s_eq, acc), final_claim):
        raise ChipError(f"{compiled.name}: main sumcheck recombination mismatch")

    opening = ChipOpening(point, proof.wit_evals, proof.fixed_evals)
    return opening, prod_values, logup_fracs
