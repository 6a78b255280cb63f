"""Sumcheck prover driver: host round loop over the device term kernels.

Mirrors the reference's ``IOPProverState::prove`` protocol shape (SURVEY.md
§2.9): per round, send the univariate evaluations of the batched polynomial at
t = 0..deg, absorb into the transcript, sample one ext challenge, fold. The
round loop runs on host (O(n_vars) small device calls); all O(N) work is in
sumcheck/terms.py kernels.

Variable order: round k binds the current TOP variable; the returned opening
point is LSB-first (point[j] <-> var j), i.e. challenges reversed.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from ..fields import babybear as bb
from ..fields import ext4_host as exth
from ..hash.transcript import Transcript
from . import terms as T


@dataclass
class TermSpec:
    """One monomial term: scalar (canonical (4,)), base/ext column indices."""

    scalar: np.ndarray
    bidx: tuple = ()
    eidx: tuple = ()


@dataclass
class SumcheckProof:
    round_msgs: np.ndarray  # (n_rounds, deg+1, 4) canonical uint64


@dataclass
class SumcheckOutput:
    proof: SumcheckProof
    point: np.ndarray       # (n_vars, 4) canonical, LSB-first
    final_base: np.ndarray  # (Cb, 4) canonical: base cols evaluated at point
    final_ext: np.ndarray   # (Ce, 4) canonical: ext cols evaluated at point


def _pad_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def compile_terms(term_list: list[TermSpec], n_base: int, n_ext: int):
    """Pad terms into dense index matrices (T padded to pow2, sentinel cols)."""
    db = max((len(t.bidx) for t in term_list), default=0)
    de = max((len(t.eidx) for t in term_list), default=0)
    deg = max((len(t.bidx) + len(t.eidx) for t in term_list), default=0)
    tcount = _pad_pow2(len(term_list))
    bidx = np.full((tcount, db), n_base, np.int32)
    eidx = np.full((tcount, de), n_ext, np.int32)
    scal = np.zeros((tcount, 4), np.uint64)
    for i, t in enumerate(term_list):
        bidx[i, : len(t.bidx)] = t.bidx
        eidx[i, : len(t.eidx)] = t.eidx
        scal[i] = np.asarray(t.scalar, np.uint64)
    return bidx, eidx, scal, deg


def prove(
    base_cols,
    ext_cols,
    term_list: list[TermSpec],
    n_vars: int,
    transcript: Transcript,
) -> SumcheckOutput:
    """Run the sumcheck. ``base_cols``/``ext_cols`` are device Monty MLEs of
    size 2^n_vars ((N,) and (4, N)); term indices refer into those lists."""
    n_base, n_ext = len(base_cols), len(ext_cols)
    n = 1 << n_vars
    bidx_np, eidx_np, scal_np, deg = compile_terms(term_list, n_base, n_ext)
    base_bank, ext_bank = T.make_banks(list(base_cols), list(ext_cols), n)
    bidx = jnp.asarray(bidx_np)
    eidx = jnp.asarray(eidx_np)
    scalars = jnp.asarray(bb.np_to_monty(scal_np.T))  # (4, T) Monty
    midx = jnp.asarray(T.merge_indices(bidx_np, eidx_np, n_base, n_ext))

    msgs = np.zeros((n_vars, deg + 1, 4), np.uint64)
    chals = np.zeros((n_vars, 4), np.uint64)
    merged = None
    for rnd in range(n_vars):
        if rnd == 0:
            ev = T.round_evals(base_bank, ext_bank, bidx, eidx, scalars, deg=deg)
        else:
            ev = T.round_evals_ext(merged, midx, scalars, deg=deg)
        ev_h = bb.np_from_monty(np.asarray(ev)).astype(np.uint64)
        msgs[rnd] = ev_h
        transcript.append(ev_h.ravel())
        ch = np.array(transcript.sample_ext(), np.uint64)
        chals[rnd] = ch
        r_dev = jnp.asarray(bb.np_to_monty(ch))
        if rnd == 0:
            merged = T.fold_banks(base_bank, ext_bank, r_dev)
            base_bank = None
            ext_bank = None
        else:
            merged = T.fold_ext_bank(merged, r_dev)

    if n_vars == 0:
        fb = np.stack([exth.from_base(0)] * n_base) if n_base else np.zeros((0, 4), np.uint64)
        # 0-var polys are scalars; evaluate directly
        fb = (
            np.stack([exth.from_base(int(bb.np_from_monty(np.asarray(c))[0])) for c in base_cols])
            if n_base
            else np.zeros((0, 4), np.uint64)
        )
        fe = (
            np.stack([bb.np_from_monty(np.asarray(c[:, 0])).astype(np.uint64) for c in ext_cols])
            if n_ext
            else np.zeros((0, 4), np.uint64)
        )
        return SumcheckOutput(SumcheckProof(msgs), chals, fb, fe)

    fin = bb.np_from_monty(np.asarray(T.final_evals(merged))).astype(np.uint64).T  # (C, 4)
    final_base = fin[:n_base]
    final_ext = fin[n_base : n_base + n_ext]
    point = chals[::-1].copy()  # LSB-first
    return SumcheckOutput(SumcheckProof(msgs), point, final_base, final_ext)
