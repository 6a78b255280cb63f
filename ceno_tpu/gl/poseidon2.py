"""Poseidon2 permutation over Goldilocks, width 8 (host backend).

Same Poseidon2 structure as hash/poseidon2.py (external rounds with the
circ(2*M4, M4, ...) MDS, internal rounds with diagonal-plus-ones), sized for
the 64-bit field: width 8, rate 4, x^7 s-box, 8 external + 22 internal
rounds (the standard Goldilocks-width-8 configuration). Round constants are
generated deterministically from a SHA-256 counter stream and are pluggable
the same way the BabyBear tables are — swap the module-level tables for a
specific deployment's parameter set to get bit-exact transcript parity.
"""

from __future__ import annotations

import hashlib

import numpy as np

from ..fields import gl_host as gl

WIDTH = 8
RATE = 4
CAPACITY = 4
ROUNDS_F = 8
ROUNDS_P = 22
SBOX_DEGREE = 7

_SEED = b"ceno-tpu/poseidon2/goldilocks/w8/v1"


def _generate_constants(count: int, label: bytes) -> list[int]:
    """Deterministic field elements from a SHA-256 counter stream (rejection)."""
    out: list[int] = []
    ctr = 0
    while len(out) < count:
        digest = hashlib.sha256(
            _SEED + b"/" + label + ctr.to_bytes(4, "little")
        ).digest()
        for i in range(0, 32, 8):
            v = int.from_bytes(digest[i : i + 8], "little")
            if v < gl.P:  # rejection sample to uniform [0, p)
                out.append(v)
            if len(out) == count:
                break
        ctr += 1
    return out


RC_EXTERNAL = [_generate_constants(WIDTH, b"ext%d" % r) for r in range(ROUNDS_F)]
RC_INTERNAL = _generate_constants(ROUNDS_P, b"int")
INTERNAL_DIAG = [
    c if c not in (0, gl.P - 1) else c + 2
    for c in _generate_constants(WIDTH, b"diag")
]

_RC_EXTERNAL = [np.array(row, np.uint64) for row in RC_EXTERNAL]
_RC_INTERNAL = np.array(RC_INTERNAL, np.uint64)
_DIAG = np.array(INTERNAL_DIAG, np.uint64)


def _sbox(x):
    x2 = gl.mul(x, x)
    x4 = gl.mul(x2, x2)
    return gl.mul(gl.mul(x4, x2), x)


def _m4(v):
    """M4 = [[2,3,1,1],[1,2,3,1],[1,1,2,3],[3,1,1,2]] on 4 rows of v."""
    v0, v1, v2, v3 = v
    s = gl.add(gl.add(v0, v1), gl.add(v2, v3))
    two = np.uint64(2)
    return np.stack([
        gl.add(s, gl.add(v0, gl.mul(two, v1))),
        gl.add(s, gl.add(v1, gl.mul(two, v2))),
        gl.add(s, gl.add(v2, gl.mul(two, v3))),
        gl.add(s, gl.add(v3, gl.mul(two, v0))),
    ])


def _external_linear(state):
    """M_E = circ(2*M4, M4): y_i = M4 @ (x_i + sum_j x_j) per 4-block."""
    blocks = state.reshape(2, 4, *state.shape[1:])
    t = gl.add(blocks[0], blocks[1])
    out = np.stack([_m4(gl.add(blocks[0], t)), _m4(gl.add(blocks[1], t))])
    return out.reshape(state.shape)


def _internal_linear(state):
    s = state[0]
    for i in range(1, WIDTH):
        s = gl.add(s, state[i])
    diag = _DIAG.reshape((WIDTH,) + (1,) * (state.ndim - 1))
    return gl.add(gl.mul(state, diag), np.broadcast_to(s, state.shape))


def permute_host(state: np.ndarray) -> np.ndarray:
    """Poseidon2-GL permutation; state canonical uint64 (8,) or (8, N)."""
    st = np.asarray(state, np.uint64) % np.uint64(gl.P)
    st = _external_linear(st)
    half = ROUNDS_F // 2
    for r in range(half):
        rc = _RC_EXTERNAL[r].reshape((WIDTH,) + (1,) * (st.ndim - 1))
        st = _sbox(gl.add(st, rc))
        st = _external_linear(st)
    for r in range(ROUNDS_P):
        st = st.copy()
        st[0] = _sbox(gl.add(st[0], _RC_INTERNAL[r]))
        st = _internal_linear(st)
    for r in range(half, ROUNDS_F):
        rc = _RC_EXTERNAL[r].reshape((WIDTH,) + (1,) * (st.ndim - 1))
        st = _sbox(gl.add(st, rc))
        st = _external_linear(st)
    return st


def hash_elements(elems) -> np.ndarray:
    """Sponge-hash canonical elements to a (4,) digest."""
    arr = np.atleast_1d(np.asarray(elems, np.uint64)).ravel() % np.uint64(gl.P)
    st = np.zeros(WIDTH, np.uint64)
    for i in range(0, len(arr), RATE):
        chunk = arr[i : i + RATE]
        st[: len(chunk)] = gl.add(st[: len(chunk)], chunk)
        st = permute_host(st)
    return st[:CAPACITY].copy()


def compress(left: np.ndarray, right: np.ndarray) -> np.ndarray:
    """Two (4,) digests -> one (4,) digest (Merkle inner nodes).
    Batched: (4, N) x (4, N) -> (4, N)."""
    st = np.concatenate([np.asarray(left, np.uint64),
                         np.asarray(right, np.uint64)])
    return permute_host(st)[:CAPACITY]
