"""Fully-fused device sumcheck: all device rounds in ONE XLA program with an
on-device Fiat-Shamir duplex.

The axon tunnel costs ~30ms per call+fetch and ~60ns/byte on transfers, so a
per-round host loop pays O(n_rounds) round trips. This module traces the whole
device phase — round evals, transcript absorb (Poseidon2 duplex, byte-exact
mirror of hash/transcript.py), challenge sampling, folds — into one program.
The host then replays the absorb/sample sequence on its own transcript (same
permutation -> identical challenges) and continues with the host tail.

The duplex position bookkeeping is static python state at trace time (the
absorb/sample sequence per call is fixed), so only the 16-element sponge state
is traced.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import babybear as bb
from ..hash import poseidon2 as p2
from . import terms as T


class _DeviceDuplex:
    """Traced mirror of hash/transcript.py Transcript (Monty state)."""

    def __init__(self, state, pos: int, sq_pos: int, absorbed: bool):
        self.state = state
        self.pos = pos
        self.sq_pos = sq_pos
        self.absorbed = absorbed

    def append(self, elems):
        for i in range(elems.shape[0]):
            if self.pos == p2.RATE:
                self.state = p2.permute_device(self.state)
                self.pos = 0
            self.state = self.state.at[self.pos].set(
                bb.add(self.state[self.pos], elems[i])
            )
            self.pos += 1
            self.absorbed = True

    def sample_ext(self):
        vals = []
        for _ in range(4):
            if self.absorbed or self.sq_pos == p2.RATE:
                self.state = p2.permute_device(self.state)
                self.pos = 0
                self.sq_pos = 0
                self.absorbed = False
            vals.append(self.state[self.sq_pos])
            self.sq_pos += 1
        return jnp.stack(vals)


@functools.partial(
    jax.jit, static_argnames=("deg", "k", "pos", "sq_pos", "absorbed")
)
def fused_rounds(
    base_bank, ext_bank, bidx, eidx, midx, scalars, t_state,
    *, deg: int, k: int, pos: int, sq_pos: int, absorbed: bool,
):
    """Run k sumcheck rounds (evals + transcript + fold) on device.

    Returns (msgs (k, deg+1, 4) Monty, final sponge state, merged bank after
    k folds). Round 0 consumes the mixed base/ext banks; later rounds the
    merged ext bank."""
    duplex = _DeviceDuplex(t_state, pos, sq_pos, absorbed)
    msgs = []
    merged = None
    for rnd in range(k):
        if rnd == 0:
            ev = T.round_evals(base_bank, ext_bank, bidx, eidx, scalars, deg=deg)
        else:
            ev = T.round_evals_ext(merged, midx, scalars, deg=deg)
        msgs.append(ev)
        duplex.append(ev.reshape(-1))
        ch = duplex.sample_ext()
        if rnd == 0:
            merged = T.fold_banks(base_bank, ext_bank, ch)
        else:
            merged = T.fold_ext_bank(merged, ch)
    return jnp.stack(msgs), duplex.state, merged
