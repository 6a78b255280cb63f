"""Proof (de)serialization.

Round-1 format: versioned pickle of the proof dataclass tree (numpy arrays +
plain python containers — no jax objects cross this boundary). The verifying
key is NOT serialized: keygen is deterministic from (program, config, params),
so verifiers re-derive it from the guest program (the CLI does exactly this),
mirroring how the reference's vk is reproducible from the circuit registry.
"""

from __future__ import annotations

import io
import pickle

import numpy as np

MAGIC = b"CENOTPU1"


def proof_to_bytes(proof, public_values: np.ndarray, cfg, params) -> bytes:
    buf = io.BytesIO()
    buf.write(MAGIC)
    pickle.dump(
        {
            "proof": proof,
            "public_values": np.asarray(public_values, np.uint64),
            "cfg": cfg,
            "params": params,
        },
        buf,
        protocol=4,
    )
    return buf.getvalue()


def proof_from_bytes(data: bytes):
    assert data[:8] == MAGIC, "not a ceno-tpu proof"
    obj = pickle.loads(data[8:])
    return obj["proof"], obj["public_values"], obj["cfg"], obj["params"]
