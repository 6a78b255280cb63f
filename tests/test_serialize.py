"""Proof serialization: safe roundtrip, rejection of malicious input."""

import numpy as np
import pytest

from ceno_tpu.emulator import programs
from ceno_tpu.pcs.basefold import BasefoldParams
from ceno_tpu.zkvm.e2e import run_e2e
from ceno_tpu.zkvm.scheme import verify
from ceno_tpu.zkvm.serialize import (
    MAGIC, ProofFormatError, proof_from_bytes, proof_to_bytes,
)
from ceno_tpu.zkvm.tables import ZKVMConfig

CFG = ZKVMConfig(shl_x_bits=6, mem_words_log=7)
PARAMS = BasefoldParams(blowup_log=1, n_queries=4, stop_size=32)


@pytest.fixture(scope="module")
def fib_result():
    vm = programs.fibonacci_vm(8)
    return run_e2e(vm, CFG, PARAMS)


def test_roundtrip_verifies(fib_result):
    res = fib_result
    data = proof_to_bytes(res.proof, res.public_values, CFG, PARAMS)
    assert data[:8] == MAGIC
    proof2, pv2, cfg2, params2 = proof_from_bytes(data)
    np.testing.assert_array_equal(pv2, res.public_values)
    assert cfg2 == CFG and params2 == PARAMS
    assert verify(res.pk.vk, proof2)


def test_rejects_bad_magic(fib_result):
    res = fib_result
    data = proof_to_bytes(res.proof, res.public_values, CFG, PARAMS)
    with pytest.raises(ProofFormatError):
        proof_from_bytes(b"XXXXXXXX" + data[8:])


def test_rejects_truncation_and_trailing(fib_result):
    res = fib_result
    data = proof_to_bytes(res.proof, res.public_values, CFG, PARAMS)
    with pytest.raises(ProofFormatError):
        proof_from_bytes(data[: len(data) // 2])
    with pytest.raises(ProofFormatError):
        proof_from_bytes(data + b"\x00")


def test_rejects_non_whitelisted_dataclass():
    # hand-craft: dict{"proof": <C-tagged object of a forbidden class>, ...}
    import io
    from ceno_tpu.zkvm import serialize as S

    buf = io.BytesIO()
    buf.write(MAGIC)
    buf.write(b"D")
    S._w_varint(buf, 4)
    S._encode(buf, "proof")
    buf.write(b"C")  # dataclass tag with a class name NOT in the whitelist
    S._encode(buf, "VMState")
    S._w_varint(buf, 0)
    for key in ("public_values", "cfg", "params"):
        S._encode(buf, key)
        S._encode(buf, None)
    with pytest.raises(ProofFormatError, match="not allowed"):
        proof_from_bytes(buf.getvalue())


def test_no_pickle_in_decoder():
    import inspect
    from ceno_tpu.zkvm import serialize

    src = inspect.getsource(serialize)
    assert "import pickle" not in src and "pickle.loads" not in src
    assert not hasattr(serialize, "pickle")


def test_decoder_fuzz_random_and_mutated(fib_result):
    """Attacker-supplied proof bytes must raise ProofFormatError-family
    exceptions quickly — never crash the process, hang, or execute code."""
    import numpy as np

    from ceno_tpu.zkvm.serialize import (
        MAGIC, ProofFormatError, proof_from_bytes, proof_to_bytes,
    )

    rng = np.random.default_rng(41)
    # pure random buffers (with and without the magic)
    for n in (0, 1, 7, 8, 64, 4096):
        raw = bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
        try:
            proof_from_bytes(raw)
            assert False, "random bytes parsed as a proof"
        except ProofFormatError:
            pass
        try:
            proof_from_bytes(MAGIC + raw)
            assert False, "random payload parsed as a proof"
        except ProofFormatError:
            pass
    # bit-flip mutations of a REAL proof: decode must either fail cleanly
    # or produce an object (which verify would then reject) — no crashes
    res = fib_result
    blob = bytearray(proof_to_bytes(res.proof, res.public_values,
                                    res.pk.cfg, res.pk.params))
    for _ in range(200):
        pos = int(rng.integers(8, len(blob)))
        mut = bytearray(blob)
        mut[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            proof_from_bytes(bytes(mut))
        except ProofFormatError:
            pass
