"""Sequence-parallel sumcheck: hypercube rows sharded across a device mesh.

The TPU re-expression of the reference's row parallelism (SURVEY.md §2.8b P2:
rayon par-iter over 2^n rows -> here, rows partitioned over mesh axis "rows").

Layout contract: an MLE of N rows is reshaped (N/D, D) with the LOW log2(D)
index bits on the sharded axis (row i lives at [i // D, i % D] on device
i % D). Folding the TOP variable then pairs rows locally on every device, so
all sumcheck rounds down to the host threshold run with zero resharding; only
the per-round (deg+1, 4) partial sums cross the ICI (all_gather of a few
dozen bytes, summed mod p on each device).

Banks use the same column/sentinel conventions as sumcheck/terms.py; the
local per-device computation IS terms.round_evals / terms.fold_banks on the
local row slab — one code path, wrapped by shard_map.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields import babybear as bb
from ..fields import ext4
from ..sumcheck import terms as T

AXIS = "rows"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (AXIS,))


def shard_base_cols(mesh: Mesh, cols, n: int | None = None):
    """Stack base cols (list of (N,)) -> sharded (C+1, N/D, D) bank (+ ones).
    With no cols, ``n`` supplies the row count for the sentinel-ones bank."""
    d = mesh.shape[AXIS]
    n = cols[0].shape[-1] if cols else n
    bank = jnp.concatenate(
        [jnp.stack(cols), bb.ones((1, n))] if cols else [bb.ones((1, n))],
        axis=0,
    ).reshape(len(cols) + 1, n // d, d)
    return jax.device_put(bank, NamedSharding(mesh, P(None, None, AXIS)))


def shard_ext_cols(mesh: Mesh, cols):
    """Stack ext cols (list of (4, N)) -> sharded (4, C+1, N/D, D) bank."""
    d = mesh.shape[AXIS]
    n = cols[0].shape[-1]
    bank = jnp.concatenate(
        [jnp.stack(cols, axis=1), ext4.ones((1, n))], axis=1
    ).reshape(4, len(cols) + 1, n // d, d)
    return jax.device_put(bank, NamedSharding(mesh, P(None, None, None, AXIS)))


@functools.partial(
    jax.jit, static_argnames=("deg", "mesh")
)
def _round_evals_sharded(base_bank, ext_bank, bidx, eidx, scalars, *, deg: int, mesh):
    def local(base_bank, ext_bank, bidx, eidx, scalars):
        c, nloc, _ = base_bank.shape
        ev = T.round_evals(
            base_bank.reshape(c, nloc), ext_bank.reshape(4, ext_bank.shape[1], nloc),
            bidx, eidx, scalars, deg=deg,
        )
        parts = jax.lax.all_gather(ev, AXIS, axis=-1)  # (deg+1, 4, D)
        return bb.sum_mod(parts, axis=-1)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, AXIS), P(None, None, None, AXIS), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )(base_bank, ext_bank, bidx, eidx, scalars)


@functools.partial(jax.jit, static_argnames=("mesh",))
def _fold_banks_sharded(base_bank, ext_bank, r, *, mesh):
    def local(base_bank, ext_bank, r):
        c, nloc, _ = base_bank.shape
        ce = ext_bank.shape[1]
        merged = T.fold_banks(
            base_bank.reshape(c, nloc), ext_bank.reshape(4, ce, nloc), r
        )
        return merged.reshape(4, merged.shape[1], nloc // 2, 1)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, AXIS), P(None, None, None, AXIS), P()),
        out_specs=P(None, None, None, AXIS),
        check_vma=False,
    )(base_bank, ext_bank, r)


@functools.partial(jax.jit, static_argnames=("deg", "mesh"))
def _round_evals_ext_sharded(ext_bank, idx, scalars, *, deg: int, mesh):
    def local(ext_bank, idx, scalars):
        ce, nloc = ext_bank.shape[1], ext_bank.shape[2]
        ev = T.round_evals_ext(ext_bank.reshape(4, ce, nloc), idx, scalars, deg=deg)
        parts = jax.lax.all_gather(ev, AXIS, axis=-1)
        return bb.sum_mod(parts, axis=-1)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, None, AXIS), P(), P()),
        out_specs=P(),
        check_vma=False,
    )(ext_bank, idx, scalars)


@functools.partial(jax.jit, static_argnames=("mesh",))
def _fold_ext_sharded(ext_bank, r, *, mesh):
    def local(ext_bank, r):
        ce, nloc = ext_bank.shape[1], ext_bank.shape[2]
        out = T.fold_ext_bank(ext_bank.reshape(4, ce, nloc), r)
        return out.reshape(4, ce, nloc // 2, 1)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, None, AXIS), P()),
        out_specs=P(None, None, None, AXIS),
        check_vma=False,
    )(ext_bank, r)


def prove_sharded(
    mesh: Mesh,
    base_cols,
    ext_cols,
    term_list,
    n_vars: int,
    transcript,
):
    """Mesh-parallel sumcheck: device rounds sharded over rows, host tail.

    Produces byte-identical transcripts/proofs to sumcheck.prover.prove (the
    partial-sum order differs but modular addition is associative and the
    global sums are equal)."""
    from ..sumcheck import prover as sc_prover
    from ..sumcheck import host_impl as H
    from ..sumcheck.prover import SumcheckProof, SumcheckOutput

    d = mesh.shape[AXIS]
    n_base, n_ext = len(base_cols), len(ext_cols)
    bidx_np, eidx_np, scal_np, deg = sc_prover.compile_terms(term_list, n_base, n_ext)
    bidx = jnp.asarray(bidx_np)
    eidx = jnp.asarray(eidx_np)
    scalars = jnp.asarray(bb.np_to_monty(scal_np.T))
    midx = jnp.asarray(T.merge_indices(bidx_np, eidx_np, n_base, n_ext))

    base_bank = shard_base_cols(
        mesh, list(base_cols),
        n=(ext_cols[0].shape[-1] if ext_cols else None),
    )
    ext_bank = shard_ext_cols(mesh, list(ext_cols)) if ext_cols else jax.device_put(
        jnp.zeros((4, 1, base_bank.shape[1], d), bb.DTYPE)
        .at[0, 0].set(jnp.full((base_bank.shape[1], d), bb.MONTY_ONE, bb.DTYPE)),
        NamedSharding(mesh, P(None, None, None, AXIS)),
    )

    msgs = np.zeros((n_vars, deg + 1, 4), np.uint64)
    chals = np.zeros((n_vars, 4), np.uint64)
    merged = None
    merged_h = None
    on_host = False
    for rnd in range(n_vars):
        if on_host:
            ev_h = H.round_evals_host(
                np.ones((1, merged_h.shape[1]), np.uint64), merged_h,
                np.zeros((scal_np.shape[0], 0), np.int32), T.merge_indices(
                    bidx_np, eidx_np, n_base, n_ext
                ), scal_np, deg,
            )
        else:
            if rnd == 0:
                ev = _round_evals_sharded(
                    base_bank, ext_bank, bidx, eidx, scalars, deg=deg, mesh=mesh
                )
            else:
                ev = _round_evals_ext_sharded(merged, midx, scalars, deg=deg, mesh=mesh)
            ev_h = bb.np_from_monty(np.asarray(ev)).astype(np.uint64)
        msgs[rnd] = ev_h
        transcript.append(ev_h.ravel())
        ch = np.array(transcript.sample_ext(), np.uint64)
        chals[rnd] = ch
        if on_host:
            merged_h = H.fold_ext_bank_host(merged_h, ch)
            continue
        r_dev = jnp.asarray(bb.np_to_monty(ch))
        if rnd == 0:
            merged = _fold_banks_sharded(base_bank, ext_bank, r_dev, mesh=mesh)
            base_bank = ext_bank = None
        else:
            merged = _fold_ext_sharded(merged, r_dev, mesh=mesh)
        if merged.shape[2] * d <= max(H.HOST_N, 2 * d):
            # gather to host: global row j*D + d_idx <-> [., j, d_idx]
            mh = bb.np_from_monty(np.asarray(merged)).astype(np.uint64)
            c = mh.shape[1]
            glob = mh.reshape(4, c, -1)  # j-major then d: index = j*D + d
            merged_h = np.moveaxis(glob, 0, -1)  # (C, N_loc*D, 4)
            merged = None
            on_host = True

    fin = merged_h[:, 0, :]
    point = chals[::-1].copy()
    return SumcheckOutput(
        SumcheckProof(msgs), point, fin[:n_base], fin[n_base : n_base + n_ext]
    )
