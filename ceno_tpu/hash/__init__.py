"""Hashing: Poseidon2 permutation (host + device) and Fiat-Shamir transcript."""

from . import poseidon2  # noqa: F401
from .transcript import Transcript  # noqa: F401
