"""Multi-device parallelism: row-sharded (sequence-parallel) sumcheck kernels."""

from . import sharded  # noqa: F401
