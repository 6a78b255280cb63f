"""zkVM layer: opcode/table circuits, witgen, proving scheme, e2e pipeline."""

from . import layout, tables, witgen, scheme, e2e  # noqa: F401
