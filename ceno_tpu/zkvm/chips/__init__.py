"""Opcode chip circuits + witgen."""

from . import common, opcodes  # noqa: F401
