"""Mesh-parallel FULL chip proving: records -> towers -> main zerocheck.

Extends sequence parallelism (parallel/sharded.py, SURVEY.md §2.8b P2) from
one generic sumcheck kernel to the complete per-chip prove pipeline of
gkr/chip.py:

  * record inference runs under ``shard_map`` — each device evaluates the
    chip's record expressions over its local row slab, with the prefix
    selector computed from global row indices (row i lives on device
    i mod D; the low index bits are the mesh axis, parallel/sharded.py
    layout contract);
  * tower layer inference is local per device: pairing the two contiguous
    halves of a layer pairs j with j + m/2 in the UNSHARDED local index, so
    no resharding until a layer drops below 2 rows per device (then host);
  * tower level sumchecks >= 2 rows/device run through
    ``sharded.prove_sharded``; smaller levels and the host tail replay the
    exact single-device path, keeping proofs byte-identical;
  * the main zerocheck runs through ``prove_sharded`` over the witness
    columns.

The Basefold commit -> open path runs under the same mesh since round 4:
its kernels (NTT encode, Merkle hash_and_tree, fold oracles, query
gathers) are pure jitted programs, so __graft_entry__.dryrun_multichip
shards their operands over the mesh and XLA compiles them as GSPMD SPMD
programs — roots, paths and fold oracles byte-identical to the
single-device prover. Proof bytes are identical either way, which
dryrun_multichip asserts against gkr.chip.prove_chip.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..fields import babybear as bb
from ..fields import ext4
from ..fields import ext4_host as exth
from ..gkr import chip as chiplib
from ..gkr import tower as towerlib
from ..gkr.chip import ChipOpening, ChipProof
from ..mle import expression as E
from ..sumcheck import host_impl as H
from ..sumcheck.prover import TermSpec
from . import sharded
from .sharded import AXIS


def _put_rows(mesh, arr_2d):
    """(C, N) host canonical -> (C, N/D, D) device Monty, rows low-bit
    sharded (global row j*D + d at local j on device d)."""
    d = mesh.shape[AXIS]
    c, n = arr_2d.shape
    monty = bb.np_to_monty(np.asarray(arr_2d, np.uint64).astype(np.uint32))
    return jax.device_put(
        jnp.asarray(monty.reshape(c, n // d, d)),
        NamedSharding(mesh, P(None, None, AXIS)),
    )


def _sharded_record_builder(compiled, mesh):
    """Cached jitted shard_map record builder for (compiled, mesh)."""
    key = ("sharded_rb", id(mesh))
    fn = compiled._builder_cache.get(key)
    if fn is not None:
        return fn
    d = mesh.shape[AXIS]

    def build(wit, fixed, structural, inst, chals, k):
        def local(wit_l, fixed_l, structural_l, inst_l, chals_l, k_l):
            nloc = wit_l.shape[1] if compiled.n_wit else structural_l.shape[1]
            d_idx = jax.lax.axis_index(AXIS)
            iota = jax.lax.broadcasted_iota(jnp.int32, (nloc, 1), 0)[:, 0]
            gidx = iota * d + d_idx.astype(jnp.int32)
            sel = jnp.where(gidx < k_l, jnp.uint32(bb.MONTY_ONE), jnp.uint32(0))
            mr, mw, p, q = chiplib.build_records_from_sel(
                compiled, wit_l.reshape(wit_l.shape[0], nloc),
                fixed_l.reshape(fixed_l.shape[0], nloc),
                structural_l.reshape(structural_l.shape[0], nloc),
                inst_l, chals_l, sel,
            )
            # records stack record-major on top: global g = r*N + i maps to
            # local (r*N/D + i//D, i%D) — exactly the local concatenation.
            # Absent categories become zero-width arrays (shard_map pytrees
            # must be static).
            return tuple(
                jnp.zeros((4, 0, 1), bb.DTYPE) if m is None
                else m.reshape(4, -1, 1)
                for m in (mr, mw, p, q)
            )

        spec = P(None, None, AXIS)
        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(spec, spec, spec, P(), P(), P()),
            out_specs=(spec, spec, spec, spec),
            check_vma=False,
        )(wit, fixed, structural, inst, chals, k)

    fn = jax.jit(build)
    compiled._builder_cache[key] = fn
    return fn


@functools.partial(jax.jit, static_argnames=("mesh",))
def _tower_layers_sharded(v, *, mesh):
    """All product-tree layers with >= 1 row/device, input (4, m/D, D)."""

    def local(v_l):
        layers = [v_l]
        while v_l.shape[1] > 1:
            half = v_l.shape[1] // 2
            v_l = ext4.mul(v_l[:, :half], v_l[:, half:])
            layers.append(v_l)
        return tuple(reversed(layers))

    spec = P(None, None, AXIS)
    n_layers = (v.shape[1]).bit_length()
    return jax.shard_map(
        local, mesh=mesh, in_specs=(spec,),
        out_specs=tuple(spec for _ in range(n_layers)), check_vma=False,
    )(v)


@functools.partial(jax.jit, static_argnames=("mesh",))
def _logup_layers_sharded(p, q, *, mesh):
    def local(p_l, q_l):
        ps, qs = [p_l], [q_l]
        while p_l.shape[1] > 1:
            half = p_l.shape[1] // 2
            pl, pr = p_l[:, :half], p_l[:, half:]
            ql, qr = q_l[:, :half], q_l[:, half:]
            p_l = ext4.add(ext4.mul(pl, qr), ext4.mul(pr, ql))
            q_l = ext4.mul(ql, qr)
            ps.append(p_l)
            qs.append(q_l)
        return tuple(reversed(ps)), tuple(reversed(qs))

    spec = P(None, None, AXIS)
    n_layers = (p.shape[1]).bit_length()
    outs = tuple(spec for _ in range(n_layers))
    return jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec),
        out_specs=(outs, outs), check_vma=False,
    )(p, q)


def _to_host_layer(l) -> np.ndarray:
    """(4, m/D, D) sharded -> (m, 4) canonical host (global row j*D + d)."""
    mh = bb.np_from_monty(np.asarray(l)).astype(np.uint64)
    return np.moveaxis(mh.reshape(4, -1), 0, -1)


def _flat_rows(l):
    """(4, m/D, D) -> (4, m) with global ordering for prove_sharded input."""
    return l.reshape(4, -1)


def prove_towers_sharded(mesh, prod_records, logup_records, transcript):
    """Mesh-parallel mirror of tower.prove_towers_host: layer inference and
    level sumchecks sharded over the mesh, byte-identical transcript."""
    d = mesh.shape[AXIS]
    n_vars = (
        (prod_records[0].shape[1] * d if prod_records
         else logup_records[0][0].shape[1] * d)
    ).bit_length() - 1

    prod_lys_dev = [_tower_layers_sharded(v, mesh=mesh) for v in prod_records]
    logup_lys_dev = [
        _logup_layers_sharded(p, q, mesh=mesh) for p, q in logup_records
    ]
    # host copies of every layer (tiny dryrun shapes; production would fetch
    # only the below-threshold tail like gkr/tower.py hostify)
    prod_lys = [[_to_host_layer(l) for l in ls] for ls in prod_lys_dev]
    logup_lys = [
        ([_to_host_layer(l) for l in pl], [_to_host_layer(l) for l in ql])
        for pl, ql in logup_lys_dev
    ]
    # a 1-wide mesh's local reduction reaches GLOBAL size 1: drop such
    # layers (the level loop and extend_host expect the top layer at 2 rows)
    prod_lys = [[l for l in ls if l.shape[0] >= 2] for ls in prod_lys]
    logup_lys = [
        ([l for l in pl if l.shape[0] >= 2], [l for l in ql if l.shape[0] >= 2])
        for pl, ql in logup_lys
    ]

    # layers with < 1 row/device only exist on host: extend by host pairing
    def extend_host(layers):
        while layers[0].shape[0] > 2:
            v = layers[0]
            half = v.shape[0] // 2
            layers.insert(0, exth.mul(v[:half], v[half:]))
        return layers

    def extend_host_logup(pl, ql):
        while pl[0].shape[0] > 2:
            p, q = pl[0], ql[0]
            half = p.shape[0] // 2
            pl.insert(0, exth.add(exth.mul(p[:half], q[half:]),
                                  exth.mul(p[half:], q[:half])))
            ql.insert(0, exth.mul(q[:half], q[half:]))
        return pl, ql

    prod_lys = [extend_host(ls) for ls in prod_lys]
    logup_lys = [extend_host_logup(pl, ql) for pl, ql in logup_lys]

    proof = towerlib.TowerProof(
        np.stack([ls[0] for ls in prod_lys]).astype(np.uint64)
        if prod_lys else np.zeros((0, 2, 4), np.uint64),
        np.stack([np.stack([pl[0], ql[0]]) for pl, ql in logup_lys]).astype(np.uint64)
        if logup_lys else np.zeros((0, 2, 2, 4), np.uint64),
    )
    for s in range(len(prod_lys)):
        transcript.append(proof.prod_out[s].ravel())
    for s in range(len(logup_lys)):
        transcript.append(proof.logup_out[s].ravel())

    rt = np.array([transcript.sample_ext()], np.uint64)
    for level in range(1, n_vars):
        n_claims = len(prod_lys) + 2 * len(logup_lys)
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
        if half >= 2 * d:
            ext_dev = [
                jnp.asarray(bb.np_to_monty(np.ascontiguousarray(c.T)))
                for c in ext_cols
            ]
            out = sharded.prove_sharded(
                mesh, [], ext_dev, term_list, level, transcript
            )
        else:
            from ..sumcheck import prover as sc_prover

            out = sc_prover.prove([], ext_cols, term_list, level, transcript)
        proof.round_msgs.append(out.proof.round_msgs)
        evals = out.final_ext[1:]
        proof.level_evals.append(evals.copy())
        transcript.append(evals.ravel())
        mu = np.array(transcript.sample_ext(), np.uint64)
        rt = np.concatenate([out.point, mu[None, :]], axis=0)

    # final record claims (host replay, identical to prove_towers_host)
    prod_claims = [
        _eval_layer_at(ls[-1], rt) for ls in prod_lys
    ]
    logup_claims = [
        [_eval_layer_at(pl[-1], rt), _eval_layer_at(ql[-1], rt)]
        for pl, ql in logup_lys
    ]
    record_claims = (
        np.stack(prod_claims) if prod_claims else np.zeros((0, 4), np.uint64),
        np.stack([np.stack(c) for c in logup_claims])
        if logup_claims else np.zeros((0, 2, 4), np.uint64),
    )
    return proof, rt, record_claims


def _eval_layer_at(layer: np.ndarray, point: np.ndarray) -> np.ndarray:
    """MLE eval of a (m, 4) canonical layer at (log m, 4) point."""
    eq = H.build_eq_host(point)
    acc = np.zeros(4, np.uint64)
    for i in range(layer.shape[0]):
        acc = exth.add(acc, exth.mul(eq[i], layer[i]))
    return acc


def prove_chip_sharded(
    mesh,
    compiled,
    wit: np.ndarray,          # (n_wit, N) canonical host
    fixed: np.ndarray,
    structural: np.ndarray,
    instances: np.ndarray,
    num_instances: int,
    challenges: np.ndarray,
    transcript,
):
    """Mesh-parallel gkr.chip.prove_chip — byte-identical proof/opening."""
    n = wit.shape[1]
    n_vars = n.bit_length() - 1
    d = mesh.shape[AXIS]
    assert n % (2 * d) == 0, "need >= 2 rows per device"

    wit_dev = _put_rows(mesh, wit)
    fixed_dev = _put_rows(mesh, fixed) if fixed.shape[0] else jnp.zeros(
        (0, n // d, d), bb.DTYPE
    )
    structural_dev = _put_rows(mesh, structural) if structural.shape[0] else (
        jnp.zeros((0, n // d, d), bb.DTYPE)
    )
    chals_dev = jnp.asarray(bb.np_to_monty(challenges))
    inst_dev = jnp.asarray(
        bb.np_to_monty(np.asarray(instances, np.uint64).astype(np.uint32))
    )
    mr, mw, pcat, qcat = _sharded_record_builder(compiled, mesh)(
        wit_dev, fixed_dev, structural_dev, inst_dev, chals_dev,
        jnp.int32(num_instances),
    )
    prods = [m for m in (mr, mw) if m.shape[1] > 0]
    lps = [(pcat, qcat)] if pcat.shape[1] > 0 else []
    tower_proof, rt, _claims = prove_towers_sharded(mesh, prods, lps, transcript)

    x_star = rt[:n_vars]
    b_star = rt[n_vars:]
    mults, _meta = chiplib._slot_multipliers(compiled, b_star, transcript)
    sel_eq = H.build_eq_host(x_star)
    sel_eq[num_instances:] = 0

    term_list = []
    for i, slot in enumerate(compiled.slots):
        for t in slot.terms:
            sc = exth.mul(mults[i], E.eval_scalar(t.scalar, challenges, instances))
            bidx = tuple(
                chiplib._col_index(c, compiled.n_wit, compiled.n_fixed)
                for c in t.cols
            )
            term_list.append(TermSpec(sc, bidx=bidx, eidx=(0,)))

    base_cols = [wit[i] for i in range(compiled.n_wit)]
    base_cols += [fixed[i] for i in range(fixed.shape[0])]
    base_cols += [structural[i] for i in range(structural.shape[0])]
    base_dev = [
        jnp.asarray(bb.np_to_monty(c.astype(np.uint32))) for c in base_cols
    ]
    out = sharded.prove_sharded(
        mesh, base_dev,
        [jnp.asarray(bb.np_to_monty(sel_eq.T.copy().astype(np.uint32)))],
        term_list, n_vars, transcript,
    )
    transcript.append(out.final_base.ravel())

    wit_evals = out.final_base[: compiled.n_wit]
    fixed_evals = out.final_base[compiled.n_wit : compiled.n_wit + compiled.n_fixed]
    structural_evals = out.final_base[compiled.n_wit + compiled.n_fixed :]
    proof = ChipProof(
        num_instances, n_vars, tower_proof, out.proof.round_msgs,
        wit_evals, fixed_evals, structural_evals,
    )
    return proof, ChipOpening(out.point, wit_evals, fixed_evals)
