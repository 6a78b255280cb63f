"""GL multi-chip zkVM scheme: a full standalone fibonacci shard proves and
verifies over GoldilocksExt2 with the complete active chip set (gl/scheme.py;
reference `--field goldilocks`, e2e.rs:103-129)."""

import numpy as np
import pytest

from ceno_tpu.emulator import programs
from ceno_tpu.fields import gl_host as gl
from ceno_tpu.gl import scheme as gls
from ceno_tpu.zkvm.scheme import keygen
from ceno_tpu.zkvm.e2e import public_values_from_vm
from ceno_tpu.zkvm.tables import ZKVMConfig

CFG = ZKVMConfig(shl_x_bits=6, mem_words_log=7)


@pytest.mark.slow
def test_gl_full_shard_proves_and_verifies():
    vm = programs.fibonacci_vm(8)
    records = vm.run()
    pk = keygen(vm.program, CFG)
    pv = public_values_from_vm(vm, CFG)
    proof = gls.prove_gl(pk, vm, records, pv)
    vk = gls.keygen_gl(pk)
    n_active = sum(1 for k in proof.num_instances if k)
    assert n_active >= 10, "expected a full chip set"
    assert gls.verify_gl(vk, proof)

    # tamper: flip one witness eval -> recombination or PCS must fail
    import dataclasses

    ci = next(iter(proof.pieces))
    piece = proof.pieces[ci]
    bad_evals = np.array(piece.wit_evals, np.uint64)
    bad_evals[0, 0] = (int(bad_evals[0, 0]) + 1) % gl.P
    bad_pieces = dict(proof.pieces)
    bad_pieces[ci] = dataclasses.replace(piece, wit_evals=bad_evals)
    with pytest.raises(Exception):
        gls.verify_gl(vk, dataclasses.replace(proof, pieces=bad_pieces))

    # tamper: public value change must be rejected (transcript binding)
    bad_pv = np.array(proof.public_values, np.uint64)
    bad_pv[0] ^= 1
    with pytest.raises(Exception):
        gls.verify_gl(vk, dataclasses.replace(proof, public_values=bad_pv))
