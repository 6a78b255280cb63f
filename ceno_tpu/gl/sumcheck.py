"""Batched sumcheck over GoldilocksExt2 (host reference kernels).

Protocol mirror of sumcheck/{prover,verifier}.py for the Goldilocks
configuration: prove sum_x sum_t scalar_t * prod(cols_t(x)) with per-round
univariate messages at nodes 0..deg, binding the TOP variable each round
(contiguous halves — the same convention the PCS codeword fold uses, so
gl/pcs.py can interleave folds with rounds).

Columns: base columns are (N,) canonical uint64, ext columns (N, 2).
Terms: (scalar (2,), bidx tuple into base cols, eidx tuple into ext cols).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ..fields import gl_host as gl
from ..fields import gl2_host as g2


class GlSumcheckError(Exception):
    pass


@dataclass
class GlSumcheckOutput:
    round_msgs: np.ndarray    # (n_vars, deg+1, 2)
    point: np.ndarray         # (n_vars, 2) LSB-last (round order = top-first)
    final_base: np.ndarray    # (n_base, 2) column evals at the point
    final_ext: np.ndarray     # (n_ext, 2)


def build_eq(point: np.ndarray) -> np.ndarray:
    """(n, 2) point -> (2^n, 2) eq table in ROUND order: point[0] is the TOP
    row-index bit (the variable round 0 binds via the contiguous-halves
    fold), point[n-1] the bottom. Processing variables in reverse makes
    point[0] land on the final (MSB) concatenation."""
    n = point.shape[0]
    table = np.zeros((1, 2), np.uint64)
    table[0] = g2.one()
    one = g2.one()
    for j in range(n - 1, -1, -1):
        r = point[j]
        lo = g2.mul(table, g2.sub(one, r))
        hi = g2.mul(table, r)
        table = np.concatenate([lo, hi], axis=0)
    return table


def _col(vals, is_ext: bool) -> np.ndarray:
    """Normalize a column to (N, 2) ext form."""
    return vals if is_ext else g2.from_base(vals)


def _node_eval(cols: list, t: int) -> list:
    """Per-column values at univariate node t: lo + t*(hi - lo), halves."""
    out = []
    tt = np.uint64(t % gl.P)
    for c in cols:
        half = c.shape[0] // 2
        lo, hi = c[:half], c[half:]
        out.append(g2.add(lo, g2.mul_base(g2.sub(hi, lo), tt)))
    return out


@functools.lru_cache(maxsize=None)
def _lagrange_row(dt: int, t: int) -> tuple:
    """Integer-node Lagrange weights w_k with p(t) = sum_k w_k p(k) for a
    degree-dt polynomial sampled at nodes 0..dt (exact mod p)."""
    ws = []
    for k in range(dt + 1):
        num, den = 1, 1
        for j in range(dt + 1):
            if j == k:
                continue
            num = num * ((t - j) % gl.P) % gl.P
            den = den * ((k - j) % gl.P) % gl.P
        ws.append(num * pow(den, gl.P - 2, gl.P) % gl.P)
    return tuple(ws)


def prove(base_cols: list, ext_cols: list, terms: list, n_vars: int,
          transcript, round_hook=None) -> GlSumcheckOutput:
    cols = [_col(np.asarray(c, np.uint64), False) for c in base_cols] + [
        np.asarray(c, np.uint64) for c in ext_cols
    ]
    n_base = len(base_cols)
    deg = max((len(b) + len(e) for _, b, e in terms), default=1)
    msgs = np.zeros((n_vars, deg + 1, 2), np.uint64)
    point = np.zeros((n_vars, 2), np.uint64)
    for r in range(n_vars):
        # Each term's round contribution is a univariate of degree = its own
        # term degree, usually far below the GLOBAL deg (a single sbox
        # w = u^7 monomial forces deg 8 on the whole message): evaluate the
        # term only at its deg_t+1 nodes, Lagrange-extend to the rest
        # (exact, so the messages are byte-identical to the naive path).
        node_cache: dict = {}

        def nodes_at(t):
            if t not in node_cache:
                node_cache[t] = _node_eval(cols, t)
            return node_cache[t]

        acc_nodes = np.zeros((deg + 1, 2), np.uint64)
        for scalar, bidx, eidx in terms:
            dt = len(bidx) + len(eidx)
            if dt == 0:
                continue
            vals = []
            for t in range(min(dt, deg) + 1):
                node_cols = nodes_at(t)
                prod = None
                for bi in bidx:
                    v = node_cols[bi]
                    prod = v if prod is None else g2.mul(prod, v)
                for ei in eidx:
                    v = node_cols[n_base + ei]
                    prod = v if prod is None else g2.mul(prod, v)
                vals.append(
                    g2.mul(np.asarray(scalar, np.uint64), _sum_rows(prod))
                )
            for t in range(dt + 1, deg + 1):
                ws = _lagrange_row(dt, t)
                ext = np.zeros(2, np.uint64)
                for k in range(dt + 1):
                    ext = g2.add(ext, g2.mul_base(vals[k], np.uint64(ws[k])))
                vals.append(ext)
            acc_nodes = g2.add(acc_nodes, np.stack(vals))
        msgs[r] = acc_nodes
        transcript.append(msgs[r].ravel())
        alpha = transcript.sample_ext()
        point[r] = alpha
        cols = [_fold_top(c, alpha) for c in cols]
        if round_hook is not None:
            round_hook(r, alpha)
    final = np.stack([c[0] for c in cols]) if cols else np.zeros((0, 2), np.uint64)
    return GlSumcheckOutput(msgs, point, final[:n_base], final[n_base:])


def _fold_top(c: np.ndarray, alpha: np.ndarray) -> np.ndarray:
    half = c.shape[0] // 2
    lo, hi = c[:half], c[half:]
    return g2.add(lo, g2.mul(g2.sub(hi, lo), np.asarray(alpha, np.uint64)))


def _sum_rows(v: np.ndarray) -> np.ndarray:
    # exact mod-p sum by log-depth vectorized halving (the object-dtype
    # python-int accumulation it replaces dominated the 2^16-row table
    # tower sumchecks)
    if v.shape[0] == 0:
        return np.zeros(2, np.uint64)
    while v.shape[0] > 1:
        if v.shape[0] & 1:
            v = np.concatenate([v, np.zeros((1, 2), np.uint64)])
        half = v.shape[0] // 2
        v = g2.add(v[:half], v[half:])
    return np.ascontiguousarray(v[0])


def lagrange_extrapolate(ys: np.ndarray, r: np.ndarray) -> np.ndarray:
    """Evaluate the degree-d poly through (k, ys[k]) at ext point r."""
    d = ys.shape[0] - 1
    dens = []
    for k in range(d + 1):
        den = 1
        for j in range(d + 1):
            if j != k:
                den = den * ((k - j) % gl.P) % gl.P
        dens.append(pow(den, gl.P - 2, gl.P))
    out = np.zeros(2, np.uint64)
    for k in range(d + 1):
        num = g2.one()
        for j in range(d + 1):
            if j != k:
                num = g2.mul(num, g2.sub(r, g2.from_base(j)))
        term = g2.mul_base(g2.mul(num, np.asarray(ys[k], np.uint64)),
                           np.uint64(dens[k]))
        out = g2.add(out, term)
    return out


def verify(claim: np.ndarray, round_msgs: np.ndarray, n_vars: int,
           transcript, deg: int):
    """Replay the rounds; returns (point (n,2), final reduced claim)."""
    msgs = np.asarray(round_msgs, np.uint64)
    if msgs.shape != (n_vars, deg + 1, 2):
        raise GlSumcheckError("bad round message shape")
    cur = np.asarray(claim, np.uint64)
    point = np.zeros((n_vars, 2), np.uint64)
    for r in range(n_vars):
        g0_g1 = g2.add(msgs[r, 0], msgs[r, 1])
        if not np.array_equal(g0_g1, cur):
            raise GlSumcheckError(f"round {r}: g(0)+g(1) != claim")
        transcript.append(msgs[r].ravel())
        alpha = transcript.sample_ext()
        point[r] = alpha
        cur = lagrange_extrapolate(msgs[r], alpha)
    return point, cur
