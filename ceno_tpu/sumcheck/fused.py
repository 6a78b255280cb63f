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
from ..utils import aotcache as aot


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


# Physical size cap for the scan stage: head rounds run unrolled until the
# merged bank is at most 2^SCAN_MAX_LOG wide, bounding both the per-round
# stretched work (C * 2^SCAN_MAX_LOG) and the unrolled program size.
SCAN_MAX_LOG = 14

from ..fields import ext4  # noqa: E402


def pick_head(n_vars: int) -> int:
    """Unrolled head rounds before the scan stage (round 0 is always head)."""
    return min(max(0, n_vars - 1 - SCAN_MAX_LOG), max(n_vars - 1, 0))


@aot.jit(static_argnames=("deg", "k", "pos", "sq_pos", "absorbed", "head"))
def fused_rounds(
    base_bank, ext_bank, bidx, eidx, midx, scalars, t_state,
    *, deg: int, k: int, pos: int, sq_pos: int, absorbed: bool, head: int = 0,
):
    """Run ALL k sumcheck rounds (evals + transcript + fold) on device in one
    XLA program.

    Rounds 0..head are unrolled (bank halves each round, so the big-N work
    decays geometrically); the remaining k-1-head rounds run under ONE
    ``lax.scan`` at a fixed physical size S = N/2^(head+1) using a
    block-stretched layout: after each scan fold the half-size result is
    ``jnp.repeat``-ed x2, so phys[i] = logical[i // 2^j] and every iteration
    has identical shapes. A stretched round sum overcounts each logical
    element 2^j times, corrected by multiplying the message by inv(2^j).
    This keeps the traced program O(head + 1) round bodies instead of O(k) —
    the round-1 full unroll took >10 min to compile through the axon tunnel.

    The duplex enters every scan iteration at the (pos=0, sq_pos=4,
    absorbed=False) fixed point: each round absorbs >= 1 element then
    samples, and sample_ext always permutes after an absorb.

    Returns (msgs (k, deg+1, 4) Monty, final sponge state, merged bank of
    logical size 1: (4, C, 1))."""
    duplex = _DeviceDuplex(t_state, pos, sq_pos, absorbed)
    msgs = []
    merged = None
    for rnd in range(head + 1):
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
    n_scan = k - 1 - head
    if n_scan <= 0:
        return jnp.stack(msgs), duplex.state, merged

    # inv(2^j) Monty correction factors, j = 1..n_scan (stretch factor at
    # scan step j is 2^j: the bank was repeated once per completed scan step)
    inv2 = pow(2, bb.P - 2, bb.P)
    invf = jnp.asarray(
        bb.np_to_monty(
            np.array([pow(inv2, j, bb.P) for j in range(n_scan)], np.uint64)
            .astype(np.uint32)
        )
    )

    def body(carry, invf_j):
        bank, st = carry
        d = _DeviceDuplex(st, 0, 4, False)
        ev = T.round_evals_ext(bank, midx, scalars, deg=deg)
        ev = bb.mul(invf_j, ev)
        d.append(ev.reshape(-1))
        ch = d.sample_ext()
        half = bank.shape[2] // 2
        a = bank[:, :, :half]
        b = bank[:, :, half:]
        c = ext4.add(a, ext4.mul(ch[:, None, None], ext4.sub(b, a)))
        return (jnp.repeat(c, 2, axis=2), d.state), ev

    (bank, st), scan_msgs = jax.lax.scan(body, (merged, duplex.state), invf)
    all_msgs = jnp.concatenate([jnp.stack(msgs), scan_msgs], axis=0)
    return all_msgs, st, bank[:, :, :1]
