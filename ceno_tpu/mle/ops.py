"""Dense multilinear-extension kernels (device, jax).

Conventions (fixed for the whole framework):
  * An n-variable MLE is its evaluation table over the hypercube, index bit j
    <-> variable j (LSB-first). Base MLEs are uint32[N] Monty arrays; ext MLEs
    are uint32[4, N] (component axis leading — see fields/ext4.py).
  * ``fold_top`` fixes the TOP variable (n-1) so the two halves are contiguous
    slices — the memory-friendly direction on TPU. Sumcheck therefore binds
    variables from high to low, and a point returned by a sumcheck of
    challenges [c_0, c_1, ...] (sample order) is stored LSB-first as
    ``point[j] = c_{n-1-j}``.

Mirror of the reference's ``multilinear_extensions`` crate (SURVEY.md §2.9):
``build_eq_x_r_vec`` -> :func:`build_eq`, ``fix_variables`` -> :func:`fold_top`,
``evaluate`` -> :func:`evaluate`.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fields import babybear as bb
from ..fields import ext4


def is_ext(m) -> bool:
    return m.ndim >= 2 and m.shape[0] == 4


def num_vars(m) -> int:
    n = m.shape[-1]
    assert n & (n - 1) == 0
    return n.bit_length() - 1


def to_ext(m):
    return m if is_ext(m) else ext4.from_base(m)


def fold_top(m, r):
    """Fix the top variable to ext scalar ``r`` (shape (4,)): N -> N/2."""
    half = m.shape[-1] // 2
    if is_ext(m):
        lo, hi = m[:, :half], m[:, half:]
        return ext4.add(lo, ext4.mul(r[:, None], ext4.sub(hi, lo)))
    lo, hi = m[:half], m[half:]
    return ext4.add(ext4.from_base(lo), ext4.mul_base(r[:, None], bb.sub(hi, lo)))


def fold_top_base(m, r_base):
    """Fix the top variable to a base scalar; stays in the base field."""
    half = m.shape[-1] // 2
    lo, hi = m[:half], m[half:]
    return bb.add(lo, bb.mul(r_base, bb.sub(hi, lo)))


def evaluate(m, point):
    """Evaluate at ``point``: (n, 4) Monty ext coords, point[j] <-> var j."""
    n = num_vars(m)
    assert point.shape[0] == n
    for j in range(n - 1, -1, -1):
        m = fold_top(m, point[j])
    return m[:, 0]


import jax as _jax

from ..utils import aotcache as _aot


@_aot.jit
def build_eq_jit(point):
    """Jitted build_eq (one XLA program per point length)."""
    return build_eq(point)


def build_eq(point, scale=None):
    """eq(x, r) table: (4, 2^n) with eq[i] = prod_j (i_j r_j + (1-i_j)(1-r_j)).

    ``point``: (n, 4) Monty ext, LSB-first. Optional ext ``scale`` (4,)
    premultiplies every entry (used for scaled selectors).
    """
    n = point.shape[0]
    if scale is None:
        e = ext4.ones((1,))
    else:
        e = scale[:, None]
    for j in range(n):
        hi = ext4.mul(e, point[j][:, None])
        lo = ext4.sub(e, hi)
        e = jnp.concatenate([lo, hi], axis=-1)
    return e


def batch_fold_top(mles, r):
    """Fold a list of MLEs (mixed base/ext) by the same challenge."""
    return [fold_top(m, r) for m in mles]
