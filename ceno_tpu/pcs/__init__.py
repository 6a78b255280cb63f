"""Polynomial commitment schemes: Basefold-RS (default), NTT + Merkle kernels."""

from . import ntt, merkle, basefold  # noqa: F401
