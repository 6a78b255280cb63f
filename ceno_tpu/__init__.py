"""ceno-tpu: a TPU-native zero-knowledge proving framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
scroll-tech/ceno (segmented RISC-V zkVM with GKR/sumcheck IOP + Basefold PCS).
Witness generation (RISC-V emulation) runs on host; the prover's cryptographic
core — field arithmetic, sumcheck/GKR, tower arguments, MLE ops, Basefold
commitments, Poseidon2 hashing — runs as vectorized TPU kernels scaled over a
jax.sharding.Mesh.

See SURVEY.md at the repo root for the reference layer map this build follows.
"""

__version__ = "0.1.0"

from . import utils  # noqa: F401,E402  (enables the persistent compile cache)
