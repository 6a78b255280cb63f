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
import os

import numpy as np
import jax.numpy as jnp

from ..fields import babybear as bb
from ..fields import ext4_host as exth
from ..hash.transcript import Transcript
from . import terms as T
from . import host_impl as H


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
    round_hook=None,
) -> SumcheckOutput:
    """Run the sumcheck over MLE columns of size 2^n_vars.

    Columns may be device Monty arrays (base (N,), ext (4, N)) or host
    canonical numpy arrays (base (N,) uint, ext (N, 4) uint64). Device rounds
    run the terms.py kernels; once the folded size drops to HOST_N (or if the
    input starts small / on host) the remaining rounds run in numpy — device
    dispatch and program count dominate below that size.
    """
    # ext items may be (4, k, N) device BLOCKS of k columns (see make_banks)
    n_base = len(base_cols)
    n_ext = sum(
        c.shape[1] if (not isinstance(c, np.ndarray) and c.ndim == 3) else 1
        for c in ext_cols
    )
    n = 1 << n_vars
    bidx_np, eidx_np, scal_np, deg = compile_terms(term_list, n_base, n_ext)
    on_host = (n <= H.HOST_N) or (
        (base_cols and isinstance(base_cols[0], np.ndarray))
        or (ext_cols and isinstance(ext_cols[0], np.ndarray))
    )
    midx_np = T.merge_indices(bidx_np, eidx_np, n_base, n_ext)

    from ..utils import spans

    if on_host:
        hbase = [np.asarray(_to_host_base(c), np.uint64) for c in base_cols]
        hext = []
        for c in ext_cols:
            if not isinstance(c, np.ndarray) and c.ndim == 3:
                blk = bb.np_from_monty(np.asarray(c)).astype(np.uint64)
                for i in range(blk.shape[1]):  # (4, k, N) -> k of (N, 4)
                    hext.append(np.ascontiguousarray(blk[:, i, :].T))
            else:
                hext.append(np.asarray(_to_host_ext(c), np.uint64))
        base_bank_h, ext_bank_h = H.make_banks_host(hbase, hext, n)
        merged_h = None
        base_bank = ext_bank = None
    else:
        with spans.span("sc-make-banks"):
            base_bank, ext_bank = T.make_banks(list(base_cols), list(ext_cols), n)
        base_bank_h = ext_bank_h = merged_h = None
    bidx = jnp.asarray(bidx_np)
    eidx = jnp.asarray(eidx_np)
    scalars = jnp.asarray(bb.np_to_monty(scal_np.T))  # (4, T) Monty
    midx = jnp.asarray(midx_np)

    msgs = np.zeros((n_vars, deg + 1, 4), np.uint64)
    chals = np.zeros((n_vars, 4), np.uint64)
    merged = None
    start_rnd = 0
    use_fused = os.environ.get("CENO_TPU_FUSED", "1") == "1"
    if use_fused and not on_host and round_hook is None:
        # ONE device call for all device-side rounds: on-device transcript,
        # host replays the sponge afterwards (see sumcheck/fused.py). Default
        # since round 2: the scan-stage program compiles in normal time (the
        # round-1 full unroll was >10 min through the axon tunnel).
        from . import fused as F

        k = n_vars
        st, pos, sq_pos, absorbed = transcript.export_state()
        with spans.span("sc-fused-dispatch"):
            msgs_dev, end_state, merged = F.fused_rounds(
                base_bank, ext_bank, bidx, eidx, midx, scalars,
                jnp.asarray(bb.np_to_monty(st.astype(np.uint32))),
                deg=deg, k=k, pos=pos, sq_pos=sq_pos, absorbed=absorbed,
                head=F.pick_head(k),
            )
        base_bank = ext_bank = None
        with spans.span("sc-fused-fetch"):
            fetched = bb.np_from_monty(np.asarray(msgs_dev)).astype(np.uint64)
        for r in range(k):
            msgs[r] = fetched[r]
            transcript.append(fetched[r].ravel())
            ch = np.array(transcript.sample_ext(), np.uint64)
            chals[r] = ch
        end_h = bb.np_from_monty(np.asarray(end_state)).astype(np.uint64)
        assert np.array_equal(end_h, transcript.state), (
            "device duplex diverged from host transcript"
        )
        with spans.span("sc-merged-fetch"):
            mh = bb.np_from_monty(np.asarray(merged)).astype(np.uint64)
        merged_h = np.moveaxis(mh, 0, -1)  # (C, size, 4)
        merged = None
        on_host = True
        start_rnd = k
    pending_r = None  # device challenge whose fold is fused into the next call
    for rnd in range(start_rnd, n_vars):
        if on_host:
            if merged_h is None:
                ev_h = H.round_evals_host(
                    base_bank_h, ext_bank_h, bidx_np, eidx_np, scal_np, deg
                )
            else:
                ev_h = H.round_evals_host(
                    np.ones((1, merged_h.shape[1]), np.uint64),
                    merged_h,
                    np.zeros((scal_np.shape[0], 0), np.int32),
                    midx_np,
                    scal_np,
                    deg,
                )
        elif rnd == 0:
            ev = T.round_evals(base_bank, ext_bank, bidx, eidx, scalars, deg=deg)
            ev_h = bb.np_from_monty(np.asarray(ev)).astype(np.uint64)
        else:
            # fused: fold by the previous challenge + evaluate this round
            if merged is None:
                ev, merged = T.fold_mixed_then_round(
                    base_bank, ext_bank, pending_r, midx, scalars, deg=deg
                )
                base_bank = ext_bank = None
            else:
                ev, merged = T.fold_ext_then_round(
                    merged, pending_r, midx, scalars, deg=deg
                )
            pending_r = None
            ev_h = bb.np_from_monty(np.asarray(ev)).astype(np.uint64)
        msgs[rnd] = ev_h
        transcript.append(ev_h.ravel())
        ch = np.array(transcript.sample_ext(), np.uint64)
        chals[rnd] = ch
        if round_hook is not None:
            round_hook(rnd, ch)
        if on_host:
            if merged_h is None:
                merged_h = H.fold_banks_host(base_bank_h, ext_bank_h, ch)
                base_bank_h = ext_bank_h = None
            else:
                merged_h = H.fold_ext_bank_host(merged_h, ch)
            continue
        r_dev = jnp.asarray(bb.np_to_monty(ch))
        cur_size = base_bank.shape[1] >> rnd if merged is None else merged.shape[-1]
        if cur_size // 2 <= H.HOST_N or rnd == n_vars - 1:
            # unfused fold, then continue on host
            if merged is None:
                merged = T.fold_banks(base_bank, ext_bank, r_dev)
                base_bank = ext_bank = None
            else:
                merged = T.fold_ext_bank(merged, r_dev)
            mh = bb.np_from_monty(np.asarray(merged)).astype(np.uint64)
            merged_h = np.moveaxis(mh, 0, -1)  # (C, half, 4)
            merged = None
            on_host = True
        else:
            pending_r = r_dev  # folded inside the next round's fused call

    if n_vars == 0:
        # 0-var polys are scalars; evaluate directly
        fb = (
            np.stack([exth.from_base(int(_to_host_base(c)[0])) for c in base_cols])
            if n_base
            else np.zeros((0, 4), np.uint64)
        )
        fe = (
            np.stack([np.asarray(_to_host_ext(c)[0], np.uint64) for c in ext_cols])
            if n_ext
            else np.zeros((0, 4), np.uint64)
        )
        return SumcheckOutput(SumcheckProof(msgs), chals, fb, fe)

    fin = merged_h[:, 0, :]  # (C, 4): rounds always end on host (size 1)
    final_base = fin[:n_base]
    final_ext = fin[n_base : n_base + n_ext]
    point = chals[::-1].copy()  # LSB-first
    return SumcheckOutput(SumcheckProof(msgs), point, final_base, final_ext)


def _to_host_base(c) -> np.ndarray:
    """Device Monty (N,) or host canonical (N,) -> host canonical uint64."""
    if isinstance(c, np.ndarray):
        return np.asarray(c, np.uint64)
    return bb.np_from_monty(np.asarray(c)).astype(np.uint64)


def _to_host_ext(c) -> np.ndarray:
    """Device Monty (4, N) or host canonical (N, 4) -> host canonical (N, 4)."""
    if isinstance(c, np.ndarray):
        return np.asarray(c, np.uint64)
    return bb.np_from_monty(np.asarray(c)).astype(np.uint64).T
