"""Basefold-RS multilinear PCS: batch commit, batched multi-point open, verify.

Role mirror of the reference's ``mpcs::Basefold`` (SURVEY.md §2.9, hot loop #3
in §3.2). Commit = column-wise RS encode (pcs/ntt.py) + Poseidon2 Merkle over
rows; open = the classic Basefold interleaving of an eq-weighted batching
sumcheck with codeword folding; verify = transcript replay + fold-consistency
spot checks at sampled query positions.

Batched opening protocol (one height class, C columns, K points):
  1. gamma <- transcript; per CLAIMED (point k, column j) pair a weight
     c_jk = gamma^t (t = running claim index). Unclaimed pairs weigh 0.
  2. Prover combines per point: F_k = sum_j c_jk f_j (ONE ext column per
     point), and K fold oracles U_0^(k) = sum_j c_jk cw_j — one PER POINT,
     all folded with the shared challenges, committed together (one Merkle
     tree per fold level over the concatenated K-tuple rows).
  3. Sumcheck over sum_x sum_k eq(x, z_k) F_k(x) = sum c_jk y_jk, degree 2,
     K terms. After each challenge r_t the prover folds every oracle
     U_{t+1}^k[i] = ((U_t^k[i]+U_t^k[i+M/2]) + r_t w_M^{-i}(U_t^k[i]-U_t^k[i+M/2]))/2
     and absorbs the Merkle root of the level (so r_{t+1} binds it); once the
     codewords are <= STOP_SIZE they are sent in full instead.
  4. F_k(point) final evals are absorbed; queries sampled; each query opens
     the base leaf pair and every committed fold level's K-tuple pair, and
     the verifier replays each of the K fold chains down to the in-clear
     tail; tail k's own folds must collapse to the CONSTANT F_k(point),
     binding every per-point eval individually.

Per-point oracles are the soundness fix for the round-1 scheme, which folded
only the single combined oracle sum_k U^(k): that bound just sum_k F_k(point),
leaving K>=2 point evals under-constrained (a cheating prover could shift the
sumcheck messages by a constant and pick point_evals offsets d_k with
sum d_k = 0, sum eq_k(point) d_k = Delta — both checks passed while forging
arbitrary opening values). With one fold chain per point, each F_k(point) is
forced by its own chain's random spot checks (standard single-point Basefold
soundness applied K times with shared challenges).

The domain/variable-order trick that makes codeword folding bind the SAME
variable as a top-variable sumcheck round is documented in pcs/ntt.py.
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
from ..utils import aotcache as aot
from ..mle import ops
from ..sumcheck import prover as sc_prover
from ..sumcheck import verifier as sc_verifier
from ..sumcheck import host_impl as H
from ..sumcheck.prover import TermSpec
from . import ntt
from .merkle import MerkleTree, hash_and_tree, gather_rows, verify_path, verify_paths


@dataclass
class BasefoldParams:
    blowup_log: int = 3
    # conjectured security ~= n_queries * blowup_log + pow_bits
    # (29*3 + 16 = 103 bits; the reference security config pairs
    # Conjecture100bits with PoW grinding the same way)
    n_queries: int = 29
    pow_bits: int = 16    # query-phase proof-of-work grinding bits
    stop_size: int = 256  # codeword sent in clear below this
    # PcsKind mirror (e2e.rs:103-129; reference default is Jagged<Basefold>):
    # True = ONE stacked commitment + translation sumcheck per shard
    # (pcs/jagged.py); False = one commitment per height class.
    jagged: bool = True
    # inner opening scheme for the jagged single-point batch:
    # "basefold" (device kernels) or "whir" (pcs/whir.py, host path)
    pcs_kind: str = "basefold"

    @property
    def blowup(self) -> int:
        return 1 << self.blowup_log


@dataclass
class Committed:
    """Prover-side commitment: retains evals + codeword on device."""

    cols: object          # (C, N) device Monty evals
    codeword: object      # (C, M) device Monty
    tree: MerkleTree
    n_vars: int

    @property
    def root(self) -> np.ndarray:
        return self.tree.root


@dataclass
class Claim:
    point_idx: int
    col_idx: int
    value: np.ndarray  # (4,) canonical


@dataclass
class QueryProof:
    index: int
    base_rows: np.ndarray   # (C, 2) canonical: rows (i, i+M/2)
    base_paths: np.ndarray  # (2, depth, 8)
    u_rows: list            # per committed fold level: (2, K, 4) canonical
    u_paths: list           # per committed fold level: (2, depth_t, 8)


@dataclass
class OpeningProof:
    sumcheck_msgs: np.ndarray  # (n, 3, 4) canonical
    fold_roots: list           # [(8,) canonical] for committed U_t levels
    tail: np.ndarray           # (K, S, 4) canonical in-clear codewords
    point_evals: np.ndarray    # (K, 4): F_k(point)
    queries: list = field(default_factory=list)
    pow_nonce: int = 0         # query-phase grinding nonce


_INV2 = bb.const(pow(2, bb.P - 2, bb.P))


@functools.lru_cache(maxsize=32)
def _invw_dev(log_m: int):
    """Device fold twiddles, cached per size (one transfer per process)."""
    return jnp.asarray(bb.np_to_monty(ntt.domain_pow_inv(log_m)))


# ---------------------------------------------------------------------------
# Device kernels
# ---------------------------------------------------------------------------

@aot.jit
def combine_columns(cols, weights):
    """sum_j weights[:, j] * cols[j]: (C, N) x (4, C) -> (4, N) ext."""

    def body(carry, xs):
        w, col = xs  # (4,), (N,)
        contrib = jnp.stack([bb.mul(w[i], col) for i in range(4)])
        return ext4.add(carry, contrib), None

    init = jnp.zeros((4, cols.shape[1]), bb.DTYPE)
    acc, _ = jax.lax.scan(body, init, (weights.T, cols))
    return acc


@aot.jit
def fold_codewords_and_tree(us, r, invw):
    """Fused fold + Merkle of the K per-point oracles (one device call).

    us (K, 4, M) -> folded (K, 4, M/2) plus the Merkle tree over the
    concatenated (4K, M/2) rows (leaf i commits the K-tuple at position i)."""
    folded = jax.vmap(lambda u: fold_codeword(u, r, invw))(us)
    k, _, m = folded.shape
    leaves, levels = hash_and_tree(folded.reshape(k * 4, m))
    return folded, leaves, levels


@aot.jit
def fold_codewords(us, r, invw):
    """us (K, 4, M) -> (K, 4, M/2)."""
    return jax.vmap(lambda u: fold_codeword(u, r, invw))(us)


@aot.jit
def fold_codeword(u, r, invw):
    """One Basefold fold: (4, M) -> (4, M/2). invw (M/2,) Monty twiddles."""
    half = u.shape[1] // 2
    a, b = u[:, :half], u[:, half:]
    s = ext4.add(a, b)
    d = ext4.mul_base(ext4.sub(a, b), invw)
    out = ext4.add(s, ext4.mul(r[:, None], d))
    return ext4.mul_base(out, jnp.full((), _INV2, bb.DTYPE))


def _combine_host(cols: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """sum_j weights[j] * cols[j] on host: (C, N) x (C, 4) -> (N, 4) canonical."""
    p = np.uint64(bb.P)
    out = np.zeros((cols.shape[1], 4), np.uint64)
    for j in range(cols.shape[0]):
        if not weights[j].any():
            continue
        out = (out + cols[j][:, None] * weights[j][None, :] % p) % p
    return out


def _fold_host(u: np.ndarray, r: np.ndarray, invw: np.ndarray) -> np.ndarray:
    """Host fold on canonical (M, 4) arrays."""
    half = u.shape[0] // 2
    a, b = u[:half], u[half:]
    s = exth.add(a, b)
    d = exth.mul_base(exth.sub(a, b), invw)
    out = exth.add(s, exth.mul(d, r[None, :]))
    return exth.mul_base(out, np.uint64(pow(2, bb.P - 2, bb.P)))


# ---------------------------------------------------------------------------
# Commit
# ---------------------------------------------------------------------------

import os as _os

HOST_COMMIT_N = int(_os.environ.get("CENO_TPU_HOST_N", 1 << 12))


def commit(cols, params: BasefoldParams = BasefoldParams()) -> Committed:
    """cols: (C, N) evals — device Monty uint32 OR host canonical uint64.

    Small matrices are committed entirely on host (XLA program size and
    compile latency dominate below HOST_COMMIT_N); the host/device choice is
    recorded by the array type of Committed.cols and respected by open_batch.
    WHIR mode (params.pcs_kind) opens on host, so it commits on host too.
    """
    n = cols.shape[1]
    n_vars = n.bit_length() - 1
    if n <= HOST_COMMIT_N or params.pcs_kind == "whir":
        if not isinstance(cols, np.ndarray):
            cols = bb.np_from_monty(np.asarray(cols)).astype(np.uint64)
        cw = ntt.np_encode(cols, blowup_log=params.blowup_log)
        tree = MerkleTree.build_host(cw)
        return Committed(cols, cw, tree, n_vars)
    if isinstance(cols, np.ndarray):
        cols = jnp.asarray(bb.np_to_monty(cols.astype(np.uint32)))
    cw = ntt.encode(cols, blowup_log=params.blowup_log)
    leaves, levels = hash_and_tree(cw)
    tree = MerkleTree.from_device(leaves, levels)
    return Committed(cols, cw, tree, n_vars)


# ---------------------------------------------------------------------------
# Open
# ---------------------------------------------------------------------------

def _claim_weights(claims: list[Claim], n_points: int, n_cols: int, gamma):
    """c_jk weight matrix (K, C, 4) canonical; batched claim value."""
    w = np.zeros((n_points, n_cols, 4), np.uint64)
    batched = np.zeros(4, np.uint64)
    cur = exth.one()
    for cl in claims:
        w[cl.point_idx, cl.col_idx] = cur
        batched = exth.add(batched, exth.mul(cur, np.asarray(cl.value, np.uint64)))
        cur = exth.mul(cur, gamma)
    return w, batched


def open_batch(
    committed: Committed,
    points: np.ndarray,  # (K, n, 4) canonical, LSB-first
    claims: list[Claim],
    transcript: Transcript,
    params: BasefoldParams = BasefoldParams(),
) -> OpeningProof:
    n_vars = committed.n_vars
    n = 1 << n_vars
    m = n << params.blowup_log
    n_cols = committed.cols.shape[0]
    k = points.shape[0]

    from ..utils import spans

    gamma = np.array(transcript.sample_ext(), np.uint64)
    w, _ = _claim_weights(claims, k, n_cols, gamma)
    on_host = isinstance(committed.cols, np.ndarray)

    # per-point combined columns F_k, eq columns, and per-point fold oracles
    ext_cols = []
    if on_host:
        for kk in range(k):
            ext_cols.append(H.build_eq_host(points[kk].astype(np.uint64)))
        for kk in range(k):
            ext_cols.append(_combine_host(committed.cols, w[kk]))
        u = None
        u_host = np.stack(
            [_combine_host(committed.codeword, w[kk]) for kk in range(k)]
        )  # (K, M, 4)
    else:
        for kk in range(k):
            ext_cols.append(ops.build_eq_jit(jnp.asarray(bb.np_to_monty(points[kk]))))
        w_dev = [jnp.asarray(bb.np_to_monty(w[kk].T)) for kk in range(k)]  # (4, C)
        for kk in range(k):
            ext_cols.append(combine_columns(committed.cols, w_dev[kk]))
        u = jnp.stack(
            [combine_columns(committed.codeword, w_dev[kk]) for kk in range(k)]
        )  # (K, 4, M)
        u_host = None
    term_list = [
        TermSpec(exth.one(), eidx=(kk, k + kk)) for kk in range(k)
    ]

    fold_state = {
        "u": u,
        "u_host": u_host,
        "log_m": n_vars + params.blowup_log,
        "dev_levels": [],   # device (4, M_t) arrays for committed levels
        "host_levels": [],  # canonical (M_t, 4) for committed levels
        "trees": [],
        "tail": None,
    }

    def _u_to_host():
        # (K, 4, M) device Monty -> (K, M, 4) host canonical
        fold_state["u_host"] = np.moveaxis(
            bb.np_from_monty(np.asarray(fold_state["u"])).astype(np.uint64), 1, 2
        )
        fold_state["u"] = None

    def hook(rnd, ch):
        cur_log = fold_state["log_m"]
        invw = ntt.domain_pow_inv(cur_log)
        invw_dev = _invw_dev(cur_log)
        new_m = 1 << (cur_log - 1)
        needs_tree = (
            fold_state["tail"] is None
            and not (new_m <= params.stop_size or rnd == n_vars - 1)
        )
        if fold_state["u_host"] is None and (1 << cur_log) > 4 * H.HOST_N:
            if needs_tree:
                # fused fold + Merkle: one device call per committed level
                with spans.span(f"fold-tree/2^{cur_log}"):
                    nu, leaves, levels = fold_codewords_and_tree(
                        fold_state["u"], jnp.asarray(bb.np_to_monty(ch)),
                        invw_dev,
                    )
                    fold_state["u"] = nu
                    with spans.span("tree-fetch"):
                        tree = MerkleTree.from_device(leaves, levels)
                fold_state["dev_levels"].append(nu)
                fold_state["host_levels"].append(None)
                fold_state["trees"].append(tree)
                fold_state["log_m"] = cur_log - 1
                transcript.append(tree.root)
                return
            fold_state["u"] = fold_codewords(
                fold_state["u"], jnp.asarray(bb.np_to_monty(ch)), invw_dev
            )
        else:
            if fold_state["u_host"] is None:
                _u_to_host()
            fold_state["u_host"] = np.stack(
                [_fold_host(fold_state["u_host"][kk], ch, invw) for kk in range(k)]
            )
        fold_state["log_m"] = cur_log - 1
        if fold_state["tail"] is not None:
            return  # already in clear; nothing to absorb
        if not needs_tree:
            if fold_state["u_host"] is None:
                _u_to_host()
            fold_state["tail"] = fold_state["u_host"].copy()  # (K, S, 4)
            transcript.append(fold_state["tail"].ravel())
        else:
            mt = 1 << fold_state["log_m"]
            tree = MerkleTree.build_host(
                fold_state["u_host"].transpose(0, 2, 1).reshape(k * 4, mt)
            )
            fold_state["dev_levels"].append(None)
            fold_state["host_levels"].append(fold_state["u_host"])
            fold_state["trees"].append(tree)
            transcript.append(tree.root)

    with spans.span("open-sumcheck+folds"):
        out = sc_prover.prove(
            [], ext_cols, term_list, n_vars, transcript, round_hook=hook
        )
    point_evals = out.final_ext[k : 2 * k]
    transcript.append(point_evals.ravel())

    # query phase (PoW grinding first: attacker pays 2^pow_bits sponge
    # permutations per query-set attempt)
    pow_nonce = transcript.grind(params.pow_bits)
    n_committed = len(fold_state["trees"])
    idxs = [transcript.sample_base() % (m // 2) for _ in range(params.n_queries)]
    base_pairs = np.array(
        [[i, i + m // 2] for i in idxs], np.int32
    ).ravel()
    if on_host:
        base_rows = committed.codeword[:, base_pairs]
    else:
        base_rows = bb.np_from_monty(
            np.asarray(gather_rows(committed.codeword, jnp.asarray(base_pairs)))
        ).astype(np.uint64)  # (C, 2Q)

    # gather committed fold-level rows
    level_rows = []
    for t in range(n_committed):
        mt = m >> (t + 1)
        pair_idx = np.array(
            [[i % (mt // 2), i % (mt // 2) + mt // 2] for i in idxs], np.int32
        ).ravel()
        if fold_state["dev_levels"][t] is not None:
            dv = fold_state["dev_levels"][t]  # (K, 4, mt)
            flat = dv.reshape(k * 4, dv.shape[2])
            vals = (
                bb.np_from_monty(np.asarray(gather_rows(flat, jnp.asarray(pair_idx))))
                .astype(np.uint64)
                .reshape(k, 4, -1)
                .transpose(2, 0, 1)
            )  # (2Q, K, 4)
        else:
            vals = fold_state["host_levels"][t][:, pair_idx, :].transpose(1, 0, 2)
        level_rows.append(vals)

    # batched path extraction: ONE gather per tree covers every query
    with spans.span("query-paths"):
        base_idx = []
        for i in idxs:
            base_idx += [i, i + m // 2]
        base_paths_all = committed.tree.open_paths(base_idx)  # (2Q, d, 8)
        tree_paths = []
        for t_ in range(n_committed):
            mt = m >> (t_ + 1)
            tidx = []
            for i in idxs:
                p = i % (mt // 2)
                tidx += [p, p + mt // 2]
            tree_paths.append(fold_state["trees"][t_].open_paths(tidx))
    queries = []
    for qi, i in enumerate(idxs):
        u_rows = [
            level_rows[t_][2 * qi : 2 * qi + 2] for t_ in range(n_committed)
        ]
        u_paths = [
            tree_paths[t_][2 * qi : 2 * qi + 2] for t_ in range(n_committed)
        ]
        queries.append(
            QueryProof(
                i, base_rows[:, 2 * qi : 2 * qi + 2],
                base_paths_all[2 * qi : 2 * qi + 2], u_rows, u_paths,
            )
        )

    return OpeningProof(
        out.proof.round_msgs,
        [t.root for t in fold_state["trees"]],
        fold_state["tail"],
        point_evals,
        queries,
        pow_nonce,
    )


# ---------------------------------------------------------------------------
# Verify
# ---------------------------------------------------------------------------

class PCSError(Exception):
    pass


def verify_batch(
    root: np.ndarray,
    n_vars: int,
    n_cols: int,
    points: np.ndarray,
    claims: list[Claim],
    proof: OpeningProof,
    transcript: Transcript,
    params: BasefoldParams = BasefoldParams(),
):
    from ..utils import replay

    _chk = not replay.structure_only()
    n = 1 << n_vars
    m = n << params.blowup_log
    k = points.shape[0]
    gamma = np.array(transcript.sample_ext(), np.uint64)
    w, batched_claim = _claim_weights(claims, k, n_cols, gamma)

    n_committed = len(proof.fold_roots)
    state = {"next_root": 0, "tail_seen": False, "chals": []}

    def hook(rnd, ch):
        state["chals"].append(ch)
        new_m = m >> (rnd + 1)
        if state["tail_seen"]:
            return
        if new_m <= params.stop_size or rnd == n_vars - 1:
            transcript.append(np.asarray(proof.tail, np.uint64).ravel())
            state["tail_seen"] = True
        else:
            transcript.append(proof.fold_roots[state["next_root"]])
            state["next_root"] += 1

    point, final_claim = sc_verifier.verify(
        batched_claim, proof.sumcheck_msgs, n_vars, transcript, deg=2,
        round_hook=hook,
    )
    if state["next_root"] != n_committed:
        raise PCSError("fold root count mismatch")
    chals = state["chals"]

    # sumcheck recombination: sum_k eq_k(point) * F_k(point)
    acc = np.zeros(4, np.uint64)
    for kk in range(k):
        eq_v = exth.eq_eval(points[kk].astype(np.uint64), point.astype(np.uint64))
        acc = exth.add(acc, exth.mul(eq_v, proof.point_evals[kk]))
    if _chk and not np.array_equal(acc, final_claim):
        raise PCSError("opening sumcheck recombination mismatch")
    transcript.append(np.asarray(proof.point_evals, np.uint64).ravel())

    # each tail k folds to the CONSTANT F_k(point) — binds every point eval
    tail = np.asarray(proof.tail, np.uint64)
    tail_rounds_done = n_committed + 1  # folds before the tail was emitted
    tail_log = (m.bit_length() - 1) - tail_rounds_done
    if tail.ndim != 3 or tail.shape != (k, 1 << tail_log, 4):
        raise PCSError("tail shape mismatch")
    for kk in range(k):
        cur = tail[kk]
        tl = tail_log
        for t in range(tail_rounds_done, n_vars):
            cur = _fold_host(cur, chals[t], ntt.domain_pow_inv(tl))
            tl -= 1
        pe = np.asarray(proof.point_evals[kk], np.uint64)
        if _chk and not all(np.array_equal(cur[i], pe) for i in range(cur.shape[0])):
            raise PCSError(f"tail {kk} is not the constant F_k(point)")

    # query phase
    # check_grind ALWAYS runs (it absorbs the nonce + samples — part of the
    # transcript sequence); only the bound check is waived in replay
    if not transcript.check_grind(proof.pow_nonce, params.pow_bits) and _chk:
        raise PCSError("proof-of-work grinding check failed")
    idxs = [transcript.sample_base() % (m // 2) for _ in range(params.n_queries)]
    if [q.index for q in proof.queries] != idxs:
        raise PCSError("query indices do not match transcript")
    inv2 = np.uint64(pow(2, bb.P - 2, bb.P))

    # batched Merkle membership (one Poseidon2 batch per tree level)
    base_idx = [q.index for q in proof.queries] + [
        q.index + m // 2 for q in proof.queries
    ]
    base_vals = np.concatenate(
        [
            np.stack([q.base_rows[:, 0] for q in proof.queries]),
            np.stack([q.base_rows[:, 1] for q in proof.queries]),
        ]
    )
    base_paths = np.concatenate(
        [
            np.stack([q.base_paths[0] for q in proof.queries]),
            np.stack([q.base_paths[1] for q in proof.queries]),
        ]
    )
    if _chk and not verify_paths(root, base_idx, base_vals, base_paths):
        raise PCSError("base Merkle paths invalid")
    for t in range(n_committed):
        mt = m >> (t + 1)
        pos = [q.index % (mt // 2) for q in proof.queries]
        lvl_idx = pos + [p + mt // 2 for p in pos]
        rows_t = [np.asarray(q.u_rows[t], np.uint64) for q in proof.queries]
        for rt in rows_t:
            if rt.shape != (2, k, 4):
                raise PCSError(f"fold level {t} row shape mismatch")
        lvl_vals = np.concatenate(
            [
                np.stack([rt[0].reshape(-1) for rt in rows_t]),
                np.stack([rt[1].reshape(-1) for rt in rows_t]),
            ]
        )
        lvl_paths = np.concatenate(
            [
                np.stack([q.u_paths[t][0] for q in proof.queries]),
                np.stack([q.u_paths[t][1] for q in proof.queries]),
            ]
        )
        if _chk and not verify_paths(proof.fold_roots[t], lvl_idx, lvl_vals, lvl_paths):
            raise PCSError(f"fold level {t} Merkle paths invalid")

    for q in proof.queries:
        i = q.index
        # per-point U_0^(k) pairs from base rows
        pairs = []
        for kk in range(k):
            pair = []
            for s in range(2):
                v = np.zeros(4, np.uint64)
                for j in range(n_cols):
                    v = exth.add(v, exth.mul_base(w[kk, j], int(q.base_rows[j, s])))
                pair.append(v)
            pairs.append(pair)
        cur_log = m.bit_length() - 1
        p = i
        for t in range(tail_rounds_done):
            invw = ntt.domain_pow_inv(cur_log)[p]
            folded = []
            for kk in range(k):
                a, b = pairs[kk]
                folded.append(
                    exth.mul_base(
                        exth.add(
                            exth.add(a, b),
                            exth.mul(exth.mul_base(exth.sub(a, b), invw), chals[t]),
                        ),
                        inv2,
                    )
                )
            if t < n_committed:
                # membership of rows was verified in the batched pass above
                rows = np.asarray(q.u_rows[t], np.uint64)  # (2, K, 4)
                mt = 1 << (cur_log - 1)
                pnext = p % (mt // 2)
                slot = 0 if p < mt // 2 else 1
                for kk in range(k):
                    if _chk and not np.array_equal(folded[kk], rows[slot, kk]):
                        raise PCSError(
                            f"query {i}: fold level {t} value mismatch (point {kk})"
                        )
                pairs = [[rows[0, kk], rows[1, kk]] for kk in range(k)]
                p = pnext
                cur_log -= 1
            else:
                # folded lands in the in-clear tails
                for kk in range(k):
                    if _chk and not np.array_equal(folded[kk], tail[kk, p]):
                        raise PCSError(f"query {i}: tail value mismatch (point {kk})")
                break
    return True
