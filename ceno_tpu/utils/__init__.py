"""Shared utilities: jax configuration, logging spans."""

from . import jaxcfg  # noqa: F401  (side effect: enable persistent compile cache)
