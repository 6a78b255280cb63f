"""Row-sharded sumcheck over the virtual 8-device mesh must produce
byte-identical proofs to the single-device prover."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ceno_tpu.fields import babybear as bb
from ceno_tpu.fields import ext4_host as exth
from ceno_tpu.hash import Transcript
from ceno_tpu.sumcheck import prover as sc_prover, host_impl
from ceno_tpu.sumcheck.prover import TermSpec
from ceno_tpu.parallel import sharded

rng = np.random.default_rng(77)


def _dev_base(n_vars):
    return jnp.asarray(
        bb.np_to_monty(rng.integers(0, bb.P, size=1 << n_vars, dtype=np.uint32))
    )


def _dev_ext(n_vars):
    return jnp.asarray(
        bb.np_to_monty(rng.integers(0, bb.P, size=(4, 1 << n_vars), dtype=np.uint32))
    )


@pytest.mark.slow
def test_sharded_matches_single_device(monkeypatch):
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    monkeypatch.setattr(host_impl, "HOST_N", 64)
    n_vars = 10
    base_cols = [_dev_base(n_vars) for _ in range(3)]
    ext_cols = [_dev_ext(n_vars)]
    terms = [
        TermSpec(exth.from_base(3), bidx=(0, 1), eidx=(0,)),
        TermSpec(exth.from_base(7), bidx=(2,), eidx=(0,)),
    ]
    single = sc_prover.prove(
        list(base_cols), list(ext_cols), terms, n_vars, Transcript(b"shard-test")
    )
    mesh = sharded.make_mesh(8)
    multi = sharded.prove_sharded(
        mesh, base_cols, ext_cols, terms, n_vars, Transcript(b"shard-test")
    )
    np.testing.assert_array_equal(single.proof.round_msgs, multi.proof.round_msgs)
    np.testing.assert_array_equal(single.point, multi.point)
    np.testing.assert_array_equal(single.final_base, multi.final_base)
    np.testing.assert_array_equal(single.final_ext, multi.final_ext)


def test_sharded_base_only(monkeypatch):
    monkeypatch.setattr(host_impl, "HOST_N", 64)
    n_vars = 9
    base_cols = [_dev_base(n_vars) for _ in range(2)]
    terms = [TermSpec(exth.from_base(5), bidx=(0, 1))]
    single = sc_prover.prove(list(base_cols), [], terms, n_vars, Transcript(b"sb"))
    mesh = sharded.make_mesh(4)
    multi = sharded.prove_sharded(mesh, base_cols, [], terms, n_vars, Transcript(b"sb"))
    np.testing.assert_array_equal(single.proof.round_msgs, multi.proof.round_msgs)
    np.testing.assert_array_equal(single.final_base, multi.final_base)
