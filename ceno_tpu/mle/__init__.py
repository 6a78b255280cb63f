"""Multilinear extension ops and the constraint-expression engine."""

from . import ops, expression  # noqa: F401
