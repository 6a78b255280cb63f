"""Basefold PCS over Goldilocks (host reference kernels).

Protocol mirror of pcs/basefold.py for the `--field goldilocks`
configuration, restricted to the single-point multi-column batch the jagged
pipeline needs: commit C columns of height N = 2^n; open every column at one
shared point z.

Same domain contract as pcs/ntt.py: the committed codeword is the NTT of
the VARIABLE-REVERSED multilinear in natural domain order, so the
contiguous-halves fold (pairs i, i + M/2, twiddle w^{-i}) binds the same
variable as a top-variable sumcheck round. Rounds interleave:

  sum_x F(x) * eq(z, x) = sum_c gamma^c y_c     with F = sum_c gamma^c f_c

each round folds the F-codeword with the sampled alpha; folded levels are
Merkle-committed until ``stop_size`` then sent in clear; the query phase
(after PoW grinding) spot-checks every fold against the base commitment.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import numpy as np

from ..fields import gl_host as gl
from ..fields import gl2_host as g2
from . import poseidon2 as p2
from . import sumcheck as sc


class GlPCSError(Exception):
    pass


@dataclass
class GlParams:
    blowup_log: int = 3
    n_queries: int = 29
    pow_bits: int = 16
    stop_size: int = 64


# -- NTT / encoding ----------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _bitrev(n_bits: int) -> np.ndarray:
    n = 1 << n_bits
    idx = np.arange(n)
    rev = np.zeros(n, np.int64)
    for b in range(n_bits):
        rev |= ((idx >> b) & 1) << (n_bits - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def _stage_twiddles(s: int) -> np.ndarray:
    half = 1 << s
    w = gl.two_adic_root(s + 1)
    tw = np.empty(half, np.uint64)
    cur = 1
    for k in range(half):
        tw[k] = cur
        cur = cur * w % gl.P
    return tw


@functools.lru_cache(maxsize=None)
def domain_pow_inv(log_m: int) -> np.ndarray:
    """w_M^{-i} for i in [0, M/2) (fold twiddles)."""
    m = 1 << log_m
    w_inv = pow(gl.two_adic_root(log_m), gl.P - 2, gl.P)
    out = np.empty(m // 2, np.uint64)
    cur = 1
    for i in range(m // 2):
        out[i] = cur
        cur = cur * w_inv % gl.P
    return out


def encode(evals: np.ndarray, blowup_log: int) -> np.ndarray:
    """(C, N) canonical -> (C, N << blowup) codewords (variable-reversed
    multilinear, natural domain order; np_encode mirror over GL)."""
    c, n = evals.shape
    log_n = n.bit_length() - 1
    x = evals[:, _bitrev(log_n)].astype(np.uint64)
    for j in range(log_n):  # mobius: evals -> multilinear coefficients
        blk = 1 << j
        x = x.reshape(c, n // (2 * blk), 2, blk).copy()
        x[:, :, 1, :] = gl.sub(x[:, :, 1, :], x[:, :, 0, :])
        x = x.reshape(c, n)
    m = n << blowup_log
    padded = np.zeros((c, m), np.uint64)
    padded[:, :n] = x
    log_m = m.bit_length() - 1
    x = padded[:, _bitrev(log_m)]
    for s in range(log_m):
        blk = 1 << (s + 1)
        half = 1 << s
        x = x.reshape(c, m // blk, blk)
        lo = x[:, :, :half]
        hi = x[:, :, half:]
        thi = gl.mul(hi, _stage_twiddles(s)[None, None, :])
        x = np.concatenate([gl.add(lo, thi), gl.sub(lo, thi)], axis=2)
        x = x.reshape(c, m)
    return x


# -- Merkle (Poseidon2-GL, 4-element digests) --------------------------------

@dataclass
class GlTree:
    levels: list  # levels[0] = (4, M) leaf digests, ..., last = (4, 1) root

    @property
    def root(self) -> np.ndarray:
        return self.levels[-1][:, 0].copy()

    @staticmethod
    def build(leaf_cols: np.ndarray) -> "GlTree":
        """leaf_cols: (C, M) canonical — leaf i hashes column-slice [:, i]."""
        c, m = leaf_cols.shape
        st = np.zeros((p2.WIDTH, m), np.uint64)
        for i in range(0, c, p2.RATE):
            chunk = leaf_cols[i : i + p2.RATE]
            st[: chunk.shape[0]] = gl.add(st[: chunk.shape[0]], chunk)
            st = p2.permute_host(st)
        levels = [st[: p2.CAPACITY].copy()]
        while levels[-1].shape[1] > 1:
            cur = levels[-1]
            levels.append(p2.compress(cur[:, 0::2], cur[:, 1::2]))
        return GlTree(levels)

    def open_path(self, idx: int) -> np.ndarray:
        """(depth, 4) sibling digests."""
        out = []
        i = idx
        for lvl in self.levels[:-1]:
            out.append(lvl[:, i ^ 1].copy())
            i >>= 1
        return np.stack(out) if out else np.zeros((0, 4), np.uint64)


def _leaf_digest(col_vals: np.ndarray) -> np.ndarray:
    """(C,) canonical leaf values -> (4,) digest (single leaf)."""
    return GlTree.build(col_vals[:, None]).levels[0][:, 0]


def _verify_path(root, idx: int, leaf_digest: np.ndarray, path: np.ndarray) -> bool:
    cur = np.asarray(leaf_digest, np.uint64)
    i = idx
    for sib in np.asarray(path, np.uint64):
        if i & 1:
            cur = p2.compress(sib[:, None], cur[:, None])[:, 0]
        else:
            cur = p2.compress(cur[:, None], sib[:, None])[:, 0]
        i >>= 1
    return bool(np.array_equal(cur, np.asarray(root, np.uint64)))


# -- commit / open / verify ---------------------------------------------------

@dataclass
class GlCommitted:
    cols: np.ndarray       # (C, N) canonical
    codeword: np.ndarray   # (C, M)
    tree: GlTree
    n_vars: int

    @property
    def root(self):
        return self.tree.root


@dataclass
class GlQuery:
    index: int
    base_col_vals: np.ndarray  # (2, C) rows at idx, idx + M/2
    base_paths: np.ndarray     # (2, depth, 4)
    level_vals: list           # per committed fold level: (2, 2) ext pair
    level_paths: list          # per committed fold level: (2, depth, 4)


@dataclass
class GlOpening:
    round_msgs: np.ndarray     # (n, 3, 2) translation sumcheck messages
    fold_roots: list           # [(4,)] committed fold levels
    tail: np.ndarray           # (S, 2) in-clear final codeword
    queries: list = field(default_factory=list)
    pow_nonce: int = 0


def _use_device(n: int) -> bool:
    import os

    if not os.environ.get("CENO_GL_DEVICE"):
        # opt-in: XLA's CPU pipeline compiles chained 2-limb arithmetic
        # pathologically (exponential fusion — fields/goldilocks.py mul
        # fence note; even fenced, one Poseidon2-GL round costs ~25s of
        # CPU compile), and the axon-tunnel TPU compile of the same
        # programs has not yet been timed in isolation. The kernels are
        # byte-equality tested in eager mode (tests/test_gl_device.py).
        return False
    if n <= int(os.environ.get("CENO_GL_HOST_N", 1 << 12)):
        return False
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False


def commit(cols: np.ndarray, params: GlParams) -> GlCommitted:
    cols = np.asarray(cols, np.uint64)
    if _use_device(cols.shape[1]):
        # device path: 2-limb NTT + Poseidon2-GL Merkle kernels
        # (gl/device.py); byte-identical to the host mirror below
        from .device import commit_device

        cw, tree = commit_device(cols, params.blowup_log)
        return GlCommitted(cols, cw, tree, cols.shape[1].bit_length() - 1)
    cw = encode(cols, params.blowup_log)
    return GlCommitted(cols, cw, GlTree.build(cw), cols.shape[1].bit_length() - 1)


def _fold_cw(u: np.ndarray, alpha: np.ndarray, log_m: int) -> np.ndarray:
    """(M, 2) ext codeword -> (M/2, 2): pairs (i, i+M/2), twiddle w^{-i}."""
    m = u.shape[0]
    half = m // 2
    inv2 = np.uint64(pow(2, gl.P - 2, gl.P))
    tw = gl.mul(domain_pow_inv(log_m), inv2)
    a, b = u[:half], u[half:]
    s = g2.mul_base(g2.add(a, b), inv2)
    d = g2.mul_base(g2.sub(a, b), tw)
    return g2.add(s, g2.mul(d, np.asarray(alpha, np.uint64)))


def open_batch(committed: GlCommitted, z: np.ndarray, values: np.ndarray,
               transcript, params: GlParams) -> GlOpening:
    """Open every column at z (round-order point, (n, 2)); values (C, 2)."""
    c, n = committed.cols.shape
    n_vars = committed.n_vars
    log_m0 = n_vars + params.blowup_log
    if params.stop_size < (1 << params.blowup_log):
        raise GlPCSError("stop_size must be >= the blowup")
    gammas = transcript.sample_ext_pows(c)

    f = np.zeros((n, 2), np.uint64)
    for j in range(c):
        f = g2.add(f, g2.mul(gammas[j], g2.from_base(committed.cols[j])))
    cw = np.zeros((committed.codeword.shape[1], 2), np.uint64)
    for j in range(c):
        cw = g2.add(cw, g2.mul(gammas[j], g2.from_base(committed.codeword[j])))
    eq = sc.build_eq(np.asarray(z, np.uint64))

    fold_trees: list = []
    fold_levels: list = []
    state = {"cw": cw, "log_m": log_m0, "tail": None}

    def hook(r, alpha):
        state["cw"] = _fold_cw(state["cw"], alpha, state["log_m"])
        state["log_m"] -= 1
        if state["tail"] is not None:
            return
        cur = state["cw"]
        if cur.shape[0] <= params.stop_size:
            state["tail"] = cur.copy()
            transcript.append(cur.ravel())
        else:
            tree = GlTree.build(cur.T.reshape(2, -1))
            fold_trees.append(tree)
            fold_levels.append(cur.copy())
            transcript.append(tree.root)

    out = sc.prove([], [f, eq], [(g2.one(), (), (0, 1))], n_vars,
                   transcript, round_hook=hook)
    if state["tail"] is None:
        state["tail"] = state["cw"].copy()
        transcript.append(state["tail"].ravel())

    # query phase
    pow_nonce = transcript.grind(params.pow_bits)
    m0 = 1 << log_m0
    idxs = [transcript.sample_base() % (m0 // 2) for _ in range(params.n_queries)]
    queries = []
    for i in idxs:
        pair = [i, i + m0 // 2]
        base_vals = np.stack([committed.codeword[:, p] for p in pair])
        base_paths = np.stack([committed.tree.open_path(p) for p in pair])
        lvl_vals, lvl_paths = [], []
        for t, tree in enumerate(fold_trees):
            mt = m0 >> (t + 1)
            p0 = i % (mt // 2)
            lv = np.stack([fold_levels[t][p0], fold_levels[t][p0 + mt // 2]])
            lp = np.stack([tree.open_path(p0), tree.open_path(p0 + mt // 2)])
            lvl_vals.append(lv)
            lvl_paths.append(lp)
        queries.append(GlQuery(i, base_vals, base_paths, lvl_vals, lvl_paths))
    return GlOpening(out.round_msgs, [t_.root for t_ in fold_trees],
                     state["tail"], queries, pow_nonce)


def verify_batch(root: np.ndarray, n_vars: int, n_cols: int, z: np.ndarray,
                 values: np.ndarray, proof: GlOpening, transcript,
                 params: GlParams) -> None:
    log_m0 = n_vars + params.blowup_log
    m0 = 1 << log_m0
    gammas = transcript.sample_ext_pows(n_cols)
    claim = np.zeros(2, np.uint64)
    for j in range(n_cols):
        claim = g2.add(claim, g2.mul(gammas[j], np.asarray(values[j], np.uint64)))

    # expected number of committed fold levels from PUBLIC sizes only (a
    # prover must not get to choose where the in-clear tail starts); the
    # stop_size >= blowup guard means the tail appears by round n_vars - 1
    if params.stop_size < (1 << params.blowup_log):
        raise GlPCSError("stop_size must be >= the blowup")
    n_committed = 0
    while (m0 >> (n_committed + 1)) > params.stop_size:
        n_committed += 1
    if n_committed >= n_vars:
        raise GlPCSError("stop_size too small for this height")
    if len(proof.fold_roots) != n_committed:
        raise GlPCSError("fold level count mismatch")
    tail = np.asarray(proof.tail, np.uint64)
    if tail.shape != (m0 >> (n_committed + 1), 2):
        raise GlPCSError("bad tail shape")

    # replay rounds, absorbing fold roots / tail at the same positions
    msgs = np.asarray(proof.round_msgs, np.uint64)
    if msgs.shape != (n_vars, 3, 2):
        raise GlPCSError("bad round message shape")
    cur = claim
    point = np.zeros((n_vars, 2), np.uint64)
    tail_at = n_committed
    for r in range(n_vars):
        if not np.array_equal(g2.add(msgs[r, 0], msgs[r, 1]), cur):
            raise GlPCSError(f"round {r}: g(0)+g(1) != claim")
        transcript.append(msgs[r].ravel())
        point[r] = transcript.sample_ext()
        cur = sc.lagrange_extrapolate(msgs[r], point[r])
        if r < n_committed:
            transcript.append(np.asarray(proof.fold_roots[r], np.uint64))
        elif r == n_committed:
            transcript.append(tail.ravel())

    # final claim: F(point) * eq(z, point) where F(point) comes from folding
    # the in-clear tail with the remaining challenges
    cur_cw = tail
    log_mt = log_m0 - (tail_at + 1)
    for r in range(tail_at + 1, n_vars):
        cur_cw = _fold_cw(cur_cw, point[r], log_mt)
        log_mt -= 1
    # after all n_vars folds the codeword is the constant F(point), blown up
    f_pt = cur_cw[0]
    if not all(np.array_equal(cur_cw[i], f_pt) for i in range(cur_cw.shape[0])):
        raise GlPCSError("tail does not fold to a constant")
    eq_zp = g2.eq_eval(np.asarray(z, np.uint64), point)
    if not np.array_equal(g2.mul(f_pt, eq_zp), cur):
        raise GlPCSError("final claim mismatch")

    # queries
    if not transcript.check_grind(proof.pow_nonce, params.pow_bits):
        raise GlPCSError("proof-of-work grinding check failed")
    idxs = [transcript.sample_base() % (m0 // 2) for _ in range(params.n_queries)]
    if [q.index for q in proof.queries] != idxs:
        raise GlPCSError("query indices do not match transcript")
    for q in proof.queries:
        pair = [q.index, q.index + m0 // 2]
        vals = np.asarray(q.base_col_vals, np.uint64)
        if vals.shape != (2, n_cols):
            raise GlPCSError("bad base row shape")
        for s in range(2):
            if not _verify_path(root, pair[s], _leaf_digest(vals[s]),
                                q.base_paths[s]):
                raise GlPCSError(f"query {q.index}: base path invalid")
        # gamma-combine, then walk the folds
        cur_pair = np.stack([
            _gamma_combine(gammas, vals[0]), _gamma_combine(gammas, vals[1])
        ])
        i = q.index
        log_mt = log_m0
        for t in range(n_vars):
            mt = 1 << log_mt
            p0 = i % (mt // 2)
            inv2 = np.uint64(pow(2, gl.P - 2, gl.P))
            tw = np.uint64(
                int(domain_pow_inv(log_mt)[p0]) * int(inv2) % gl.P
            )
            s_ = g2.mul_base(g2.add(cur_pair[0], cur_pair[1]), inv2)
            d_ = g2.mul_base(g2.sub(cur_pair[0], cur_pair[1]), tw)
            nxt = g2.add(s_, g2.mul(d_, point[t]))
            mt2 = mt // 2
            if t == tail_at:
                tail = np.asarray(proof.tail, np.uint64)
                exp = tail[p0]
                if not np.array_equal(nxt, exp):
                    raise GlPCSError(f"query {q.index}: tail value mismatch")
                break
            # committed level t: fetch the pair for the NEXT fold
            lv = np.asarray(q.level_vals[t], np.uint64)
            p1 = p0 % (mt2 // 2)
            pos_in_pair = 0 if p0 < mt2 // 2 else 1
            if not np.array_equal(nxt, lv[pos_in_pair]):
                raise GlPCSError(f"query {q.index}: fold level {t} mismatch")
            lroot = np.asarray(proof.fold_roots[t], np.uint64)
            for s in range(2):
                leaf = _leaf_digest(lv[s])
                pos = p1 + s * (mt2 // 2)
                if not _verify_path(lroot, pos, leaf, q.level_paths[t][s]):
                    raise GlPCSError(f"query {q.index}: level {t} path invalid")
            cur_pair = lv
            i = p1
            log_mt -= 1


def _gamma_combine(gammas: np.ndarray, base_vals: np.ndarray) -> np.ndarray:
    acc = np.zeros(2, np.uint64)
    for j in range(base_vals.shape[0]):
        acc = g2.add(acc, g2.mul(gammas[j], g2.from_base(base_vals[j])))
    return acc
