"""zkVM proving scheme: keygen, shard prove, verify.

Role mirror of the reference's scheme layer (ZKVMProver::create_proof,
prover.rs:309 and ZKVMVerifier, verifier.rs:398 — SURVEY.md §3.2/§3.3), for a
single shard:

  prove:  absorb vk digest + public values -> batch-commit witness trace
          matrices per height class -> sample the RLC challenges alpha, beta
          -> per chip: tower + main zerocheck (gkr/chip.py) -> Basefold
          batch-open witness and fixed commitments at the chips' points.
  verify: replay transcript; per chip verify tower + main sumcheck; check
          the global bus: prod(reads) == prod(writes) and sum of logup
          fractions == 0; verify PCS openings.

Transcript order is the soundness contract and is fixed here (v1).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from ..fields import babybear as bb
from ..fields import ext4_host as exth
from ..hash.transcript import Transcript
from ..gkr import chip as chiplib
from ..gkr.chip import structural_table
from ..pcs import basefold
from ..pcs.basefold import BasefoldParams, Claim
from .chips import build_all_chips
from .tables import build_tables, ZKVMConfig
from .witgen import generate_witness, AssignedChip
from .layout import N_PUBLIC_VALUES

LABEL = b"ceno-tpu/zkvm/v1"


def _dev(x: np.ndarray):
    return jnp.asarray(bb.np_to_monty(np.asarray(x, np.uint64).astype(np.uint32)))


def _pow2_height(k: int) -> int:
    return max(2, 1 << max(0, (k - 1).bit_length()))


@dataclass
class ChipMeta:
    name: str
    compiled: object
    cb: object
    is_table: bool
    table_rows: int | None  # static height for tables, None for opcode chips


@dataclass
class ProvingKey:
    metas: list
    tables: list
    opcode_chips: list
    cfg: ZKVMConfig
    params: BasefoldParams
    fixed_committed: dict     # height -> basefold.Committed
    fixed_layout: dict        # height -> [(chip_idx, col_offset, n_fixed)]
    program_words: dict

    @property
    def vk(self) -> "VerifyingKey":
        return VerifyingKey(
            self.metas,
            self.cfg,
            self.params,
            {h: c.root for h, c in self.fixed_committed.items()},
            self.fixed_layout,
        )


@dataclass
class VerifyingKey:
    metas: list
    cfg: ZKVMConfig
    params: BasefoldParams
    fixed_roots: dict
    fixed_layout: dict

    def digest_elems(self) -> np.ndarray:
        parts = [np.uint64(len(self.metas))]
        for h in sorted(self.fixed_roots):
            parts.extend([np.uint64(h)])
            parts.extend(self.fixed_roots[h].ravel())
        return np.array(parts, np.uint64)


@dataclass
class ZKVMProof:
    public_values: np.ndarray
    num_instances: list
    witness_roots: dict        # height -> (8,) canonical
    chip_proofs: list          # chiplib.ChipProof per chip (registry order)
    witness_openings: dict     # height -> basefold.OpeningProof
    fixed_openings: dict       # height -> basefold.OpeningProof


def keygen(program_words: dict, cfg: ZKVMConfig | None = None,
           params: BasefoldParams | None = None) -> ProvingKey:
    cfg = cfg or ZKVMConfig()
    params = params or BasefoldParams()
    opcode_chips = build_all_chips()
    tables = build_tables(program_words, cfg)
    metas = [ChipMeta(c.name, c.compiled, c.cb, False, None) for c in opcode_chips]
    metas += [ChipMeta(t.name, t.compiled, t.cb, True, t.n_rows) for t in tables]

    # commit fixed columns grouped by (padded) table height
    by_height: dict = {}
    layout: dict = {}
    for ti, t in enumerate(tables):
        if not t.cb.fixed_names:
            continue
        h = _pow2_height(t.n_rows)
        fx = np.asarray(t.fixed_fn(), np.uint64)
        fx = np.pad(fx, ((0, 0), (0, h - fx.shape[1])))
        chip_idx = len(opcode_chips) + ti
        layout.setdefault(h, []).append((chip_idx, sum(
            m.shape[0] for m in by_height.get(h, [])
        ), fx.shape[0]))
        by_height.setdefault(h, []).append(fx)
    committed = {}
    for h, mats in by_height.items():
        committed[h] = basefold.commit(_dev(np.concatenate(mats, axis=0)), params)
    return ProvingKey(
        metas, tables, opcode_chips, cfg, params, committed, layout, program_words
    )


# ---------------------------------------------------------------------------
# Prove
# ---------------------------------------------------------------------------

def prove(pk: ProvingKey, vm, records, public_values: np.ndarray) -> ZKVMProof:
    assert len(public_values) == N_PUBLIC_VALUES
    t = Transcript(LABEL)
    t.append(pk.vk.digest_elems())
    t.append(np.asarray(public_values, np.uint64))

    assigned = generate_witness(
        records, pk.opcode_chips, pk.tables, vm, public_values, pk.cfg
    )

    # group witness columns by height, commit per class
    by_height: dict = {}
    wit_layout: dict = {}
    for ci, a in enumerate(assigned):
        h = a.n_rows
        off = sum(m.shape[0] for m in by_height.get(h, []))
        wit_layout.setdefault(h, []).append((ci, off, a.wit.shape[0]))
        by_height.setdefault(h, []).append(a.wit)
    wit_committed = {}
    for h in sorted(by_height):
        wit_committed[h] = basefold.commit(
            _dev(np.concatenate(by_height[h], axis=0)), pk.params
        )
        t.append(wit_committed[h].root)
    for a in assigned:
        t.append([a.num_instances % bb.P])

    challenges = np.array([t.sample_ext(), t.sample_ext()], np.uint64)

    chip_proofs = []
    openings = []
    for a in assigned:
        n = a.n_rows
        structural = (
            np.stack([structural_table(s, n) for s in a.compiled.structural])
            if a.compiled.structural
            else np.zeros((0, n), np.uint64)
        )
        fixed = _fixed_matrix(pk, a, n)
        proof, opening = chiplib.prove_chip(
            a.compiled,
            a.wit,
            fixed,
            structural,
            public_values,
            a.num_instances,
            challenges,
            t,
        )
        chip_proofs.append(proof)
        openings.append(opening)

    # PCS openings: witness classes then fixed classes (ascending height)
    witness_openings = {}
    for h in sorted(wit_committed):
        entries = wit_layout[h]
        points = np.stack([openings[ci].point for ci, _, _ in entries])
        claims = []
        for k, (ci, off, ncols) in enumerate(entries):
            for j in range(ncols):
                claims.append(Claim(k, off + j, openings[ci].wit_evals[j]))
        witness_openings[h] = basefold.open_batch(
            wit_committed[h], points, claims, t, pk.params
        )
    fixed_openings = {}
    for h in sorted(pk.fixed_committed):
        entries = pk.fixed_layout[h]
        points = np.stack([openings[ci].point for ci, _, _ in entries])
        claims = []
        for k, (ci, off, ncols) in enumerate(entries):
            for j in range(ncols):
                claims.append(Claim(k, off + j, openings[ci].fixed_evals[j]))
        fixed_openings[h] = basefold.open_batch(
            pk.fixed_committed[h], points, claims, t, pk.params
        )

    return ZKVMProof(
        np.asarray(public_values, np.uint64),
        [a.num_instances for a in assigned],
        {h: c.root for h, c in wit_committed.items()},
        chip_proofs,
        witness_openings,
        fixed_openings,
    )


def _fixed_matrix(pk: ProvingKey, a: AssignedChip, n: int) -> np.ndarray:
    if not a.cb.fixed_names:
        return np.zeros((0, n), np.uint64)
    for t in pk.tables:
        if t.name == a.name:
            fx = np.asarray(t.fixed_fn(), np.uint64)
            return np.pad(fx, ((0, 0), (0, n - fx.shape[1])))
    raise KeyError(a.name)


# ---------------------------------------------------------------------------
# Verify
# ---------------------------------------------------------------------------

class ZKVMError(Exception):
    pass


def verify(vk: VerifyingKey, proof: ZKVMProof) -> bool:
    t = Transcript(LABEL)
    t.append(vk.digest_elems())
    t.append(np.asarray(proof.public_values, np.uint64))

    # reconstruct class grouping from num_instances
    wit_layout: dict = {}
    heights = []
    for ci, meta in enumerate(vk.metas):
        k = proof.num_instances[ci]
        h = _pow2_height(k)
        if meta.is_table and k != meta.table_rows:
            raise ZKVMError(f"{meta.name}: table height mismatch")
        n_wit = len(meta.cb.wit_names)
        off = sum(e[2] for e in wit_layout.get(h, []))
        wit_layout.setdefault(h, []).append((ci, off, n_wit))
        heights.append(h)
    for h in sorted(wit_layout):
        if h not in proof.witness_roots:
            raise ZKVMError(f"missing witness root for height {h}")
        t.append(proof.witness_roots[h])
    for ci in range(len(vk.metas)):
        t.append([proof.num_instances[ci] % bb.P])

    challenges = np.array([t.sample_ext(), t.sample_ext()], np.uint64)

    prod_r = exth.one()
    prod_w = exth.one()
    logup_num = np.zeros(4, np.uint64)
    logup_den = exth.one()
    openings = []
    for ci, meta in enumerate(vk.metas):
        cp = proof.chip_proofs[ci]
        if cp.num_instances != proof.num_instances[ci] or cp.n_vars != heights[ci].bit_length() - 1:
            raise ZKVMError(f"{meta.name}: instance count mismatch")
        opening, prod_values, logup_fracs = chiplib.verify_chip(
            meta.compiled, cp, proof.public_values, challenges, t
        )
        openings.append(opening)
        pi = 0
        if meta.compiled.r_exprs:
            prod_r = exth.mul(prod_r, prod_values[pi])
            pi += 1
        if meta.compiled.w_exprs:
            prod_w = exth.mul(prod_w, prod_values[pi])
            pi += 1
        for s in range(logup_fracs.shape[0]):
            p, q = logup_fracs[s]
            logup_num = exth.add(exth.mul(logup_num, q), exth.mul(p, logup_den))
            logup_den = exth.mul(logup_den, q)

    if not np.array_equal(prod_r, prod_w):
        raise ZKVMError("global read/write product mismatch")
    if logup_num.any():
        raise ZKVMError("global logup sum is nonzero")
    if not logup_den.any():
        raise ZKVMError("logup denominator vanished")

    for h in sorted(wit_layout):
        entries = wit_layout[h]
        points = np.stack([openings[ci].point for ci, _, _ in entries])
        claims = []
        n_cols = 0
        for k, (ci, off, ncols) in enumerate(entries):
            for j in range(ncols):
                claims.append(Claim(k, off + j, openings[ci].wit_evals[j]))
            n_cols += ncols
        basefold.verify_batch(
            proof.witness_roots[h], h.bit_length() - 1, n_cols, points,
            claims, proof.witness_openings[h], t, vk.params,
        )
    for h in sorted(vk.fixed_roots):
        entries = vk.fixed_layout[h]
        points = np.stack([openings[ci].point for ci, _, _ in entries])
        claims = []
        n_cols = 0
        for k, (ci, off, ncols) in enumerate(entries):
            for j in range(ncols):
                claims.append(Claim(k, off + j, openings[ci].fixed_evals[j]))
            n_cols += ncols
        basefold.verify_batch(
            vk.fixed_roots[h], h.bit_length() - 1, n_cols, points,
            claims, proof.fixed_openings[h], t, vk.params,
        )
    return True
