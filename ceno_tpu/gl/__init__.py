"""Goldilocks proving pipeline (host reference kernels).

Role mirror of the reference's `--field goldilocks` configuration
(ff_ext::GoldilocksExt2, ceno_zkvm e2e.rs:103-129): the L1/L2 proving core
— Poseidon2 transcript, batched sumcheck, Basefold PCS — over
GoldilocksExt2 instead of BabyBearExt4. BabyBear remains the DEFAULT (and
device-accelerated) field: its 31-bit Monty arithmetic maps onto the TPU's
int32 VPU lanes, which is why the reference also defaults to BabyBear.
The full zkVM chip stack runs over GL (gl/scheme.py, per-chip schedule),
including cross-shard continuations on the quintic multiset-hash curve
(gl/shard.py, gl/shard_chips.py, gl/eccquark.py, fields/gl5_host.py —
GL.md). Remaining gaps (GL sumcheck device kernels, GL aggregation) are
tracked in PARITY.md.
"""

from . import poseidon2  # noqa: F401
from . import transcript  # noqa: F401
from . import sumcheck  # noqa: F401
from . import pcs  # noqa: F401
