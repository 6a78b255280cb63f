"""Opcode chip circuits + witgen."""

from . import common, opcodes, opcodes2, opcodes3  # noqa: F401


def build_all_chips():
    """Full opcode registry in canonical proving order (Rv32imConfig mirror)."""
    return (
        opcodes.build_opcode_chips()
        + opcodes2.build_extended_chips()
        + opcodes3.build_mul_chips()
    )
