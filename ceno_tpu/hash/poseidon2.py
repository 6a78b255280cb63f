"""Poseidon2 permutation over BabyBear, width 16 — host and device backends.

Structure follows the Poseidon2 design (external rounds with an M4-block MDS
matrix ``circ(2*M4, M4, ..., M4)``, internal rounds with a diagonal-plus-ones
matrix), the hash used by the reference's ``poseidon`` crate for transcripts
and Merkle trees (SURVEY.md §2.9).

Round constants and the internal diagonal are generated deterministically from
a SHA-256 counter stream (seed label below). They are **pluggable**: to achieve
bit-exact transcript parity with a specific reference deployment, replace the
tables produced by :func:`_generate_constants` with that deployment's tables —
every consumer reads them through module-level ``RC_EXTERNAL`` / ``RC_INTERNAL``
/ ``INTERNAL_DIAG``. (The Rust reference's gkr-backend crates are not vendored
in the snapshot, so its exact tables are not available here; see SURVEY.md §1.)

Two backends with one parameter set:
  * host: numpy uint64 canonical arithmetic (transcript hashing — sequential,
    latency-bound, must not round-trip to the device);
  * device: Monty-form uint32 jax arrays of shape (16, N) (Merkle layers,
    leaf hashing — throughput-bound, batched over N lanes).
They are cross-checked for equality in tests/test_poseidon2.py.
"""

from __future__ import annotations

import hashlib

import numpy as np
import jax.numpy as jnp

from ..fields import babybear as bb

WIDTH = 16
RATE = 8
CAPACITY = 8
ROUNDS_F = 8  # external rounds (half before, half after internal)
ROUNDS_P = 13  # internal rounds
SBOX_DEGREE = 7

_SEED = b"ceno-tpu/poseidon2/babybear/w16/v1"


def _generate_constants(count: int, label: bytes) -> list[int]:
    """Deterministic field elements from a SHA-256 counter stream (rejection)."""
    out: list[int] = []
    ctr = 0
    while len(out) < count:
        digest = hashlib.sha256(_SEED + b"/" + label + ctr.to_bytes(4, "little")).digest()
        for i in range(0, 32, 4):
            v = int.from_bytes(digest[i : i + 4], "little")
            # rejection sample to uniform [0, p)
            if v < 2 * bb.P:  # 2p < 2^32: accept v mod p only when v < 2p would bias;
                if v < bb.P:
                    out.append(v)
            if len(out) == count:
                break
        ctr += 1
    return out


RC_EXTERNAL = [
    _generate_constants(WIDTH, b"ext%d" % r) for r in range(ROUNDS_F)
]
RC_INTERNAL = _generate_constants(ROUNDS_P, b"int")
# Internal diagonal entries (nonzero, and != -1 so M_I = diag + 11^T is invertible
# in the generic case); generated from the same stream.
INTERNAL_DIAG = [
    c if c not in (0, bb.P - 1) else c + 2 for c in _generate_constants(WIDTH, b"diag")
]

# Monty-form copies for the device backend
_RC_EXTERNAL_M = np.array([[bb.const(c) for c in row] for row in RC_EXTERNAL], np.uint32)
_RC_INTERNAL_M = np.array([bb.const(c) for c in RC_INTERNAL], np.uint32)
_DIAG_M = np.array([bb.const(c) for c in INTERNAL_DIAG], np.uint32)


# ---------------------------------------------------------------------------
# Host backend: numpy uint64, canonical form. state shape (16,) or (16, N).
# ---------------------------------------------------------------------------

_P64 = np.uint64(bb.P)


def _h_sbox(x):
    x2 = x * x % _P64
    x4 = x2 * x2 % _P64
    return x4 * x2 % _P64 * x % _P64


def _h_m4(v):
    """Apply M4 = [[2,3,1,1],[1,2,3,1],[1,1,2,3],[3,1,1,2]] to 4 rows of v."""
    v0, v1, v2, v3 = v
    s = (v0 + v1 + v2 + v3) % _P64
    return np.stack([
        (s + v0 + 2 * v1) % _P64,
        (s + v1 + 2 * v2) % _P64,
        (s + v2 + 2 * v3) % _P64,
        (s + v3 + 2 * v0) % _P64,
    ])


def _h_external_linear(state):
    """M_E = circ(2*M4, M4, M4, M4): y_i = M4 @ (x_i + sum_j x_j)."""
    blocks = state.reshape(4, 4, *state.shape[1:])
    t = blocks.sum(axis=0) % _P64
    out = np.empty_like(blocks)
    for i in range(4):
        out[i] = _h_m4((blocks[i] + t) % _P64)
    return out.reshape(state.shape)


def _h_internal_linear(state):
    s = state.sum(axis=0) % _P64
    diag = np.array(INTERNAL_DIAG, np.uint64).reshape((WIDTH,) + (1,) * (state.ndim - 1))
    return (state * diag % _P64 + s) % _P64


def permute_host(state: np.ndarray) -> np.ndarray:
    """Poseidon2 permutation; ``state`` is canonical uint64 (16,) or (16, N)."""
    st = np.asarray(state, np.uint64) % _P64
    st = _h_external_linear(st)
    half = ROUNDS_F // 2
    for r in range(half):
        st = (st + np.array(RC_EXTERNAL[r], np.uint64).reshape(
            (WIDTH,) + (1,) * (st.ndim - 1))) % _P64
        st = _h_sbox(st)
        st = _h_external_linear(st)
    for r in range(ROUNDS_P):
        st[0] = (st[0] + np.uint64(RC_INTERNAL[r])) % _P64
        st[0] = _h_sbox(st[0])
        st = _h_internal_linear(st)
    for r in range(half, ROUNDS_F):
        st = (st + np.array(RC_EXTERNAL[r], np.uint64).reshape(
            (WIDTH,) + (1,) * (st.ndim - 1))) % _P64
        st = _h_sbox(st)
        st = _h_external_linear(st)
    return st


# ---------------------------------------------------------------------------
# Device backend: jax Monty uint32, state shape (16,) + batch.
# ---------------------------------------------------------------------------

def _d_sbox(x):
    x2 = bb.mul(x, x)
    x4 = bb.mul(x2, x2)
    return bb.mul(bb.mul(x4, x2), x)


def _d_m4(v0, v1, v2, v3):
    s = bb.add(bb.add(v0, v1), bb.add(v2, v3))
    return (
        bb.add(s, bb.add(v0, bb.double(v1))),
        bb.add(s, bb.add(v1, bb.double(v2))),
        bb.add(s, bb.add(v2, bb.double(v3))),
        bb.add(s, bb.add(v3, bb.double(v0))),
    )


def _d_external_linear(state):
    b = [state[4 * i : 4 * i + 4] for i in range(4)]
    t = bb.add(bb.add(b[0], b[1]), bb.add(b[2], b[3]))
    rows = []
    for i in range(4):
        x = bb.add(b[i], t)
        rows.extend(_d_m4(x[0], x[1], x[2], x[3]))
    return jnp.stack(rows)


def _d_internal_linear(state):
    s = state[0]
    for i in range(1, WIDTH):
        s = bb.add(s, state[i])
    diag = jnp.asarray(_DIAG_M).reshape((WIDTH,) + (1,) * (state.ndim - 1))
    return bb.add(bb.mul(state, diag), s)


def permute_device(state):
    """Poseidon2 permutation on Monty uint32 state of shape (16,)+batch.

    Rounds run under lax.scan (round constants are the scanned input) so the
    traced program is one round body per phase, not 21 inlined rounds —
    load-bearing for XLA program size when Merkle trees chain many permutes.
    """
    import jax

    ndim_tail = (1,) * (state.ndim - 1)
    st = _d_external_linear(state)
    half = ROUNDS_F // 2

    def ext_round(st, rc):
        return _d_external_linear(_d_sbox(bb.add(st, rc.reshape((WIDTH,) + ndim_tail)))), None

    def int_round(st, rc):
        s0 = _d_sbox(bb.add(st[0], rc))
        st = st.at[0].set(s0)
        return _d_internal_linear(st), None

    rc_ext = jnp.asarray(_RC_EXTERNAL_M)
    st, _ = jax.lax.scan(ext_round, st, rc_ext[:half])
    st, _ = jax.lax.scan(int_round, st, jnp.asarray(_RC_INTERNAL_M))
    st, _ = jax.lax.scan(ext_round, st, rc_ext[half:])
    return st


# ---------------------------------------------------------------------------
# Hash helpers (host)
# ---------------------------------------------------------------------------

DIGEST_ELEMS = 8


def hash_elements_host(elems) -> np.ndarray:
    """Sponge hash of a flat list of canonical field elements -> 8-elem digest."""
    state = np.zeros(WIDTH, np.uint64)
    elems = np.asarray(elems, np.uint64)
    n = len(elems)
    for off in range(0, max(n, 1), RATE):
        chunk = elems[off : off + RATE]
        state[: len(chunk)] = (state[: len(chunk)] + chunk) % _P64
        state = permute_host(state)
    return state[:DIGEST_ELEMS].copy()


def compress_host(left: np.ndarray, right: np.ndarray) -> np.ndarray:
    """2-to-1 compression: permute(left || right)[:8]. Inputs are 8-elem digests."""
    state = np.concatenate([np.asarray(left, np.uint64), np.asarray(right, np.uint64)])
    return permute_host(state)[:DIGEST_ELEMS].copy()
