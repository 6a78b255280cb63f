"""Poseidon2 host/device cross-checks and transcript semantics."""

import numpy as np
import jax.numpy as jnp

from ceno_tpu.fields import babybear as bb
from ceno_tpu.hash import poseidon2 as p2
from ceno_tpu.hash import Transcript

rng = np.random.default_rng(7)


def test_host_device_agree():
    n = 32
    state = rng.integers(0, bb.P, size=(p2.WIDTH, n), dtype=np.uint32)
    host = p2.permute_host(state.astype(np.uint64))
    dev_in = jnp.asarray(bb.np_to_monty(state))
    dev = bb.np_from_monty(np.asarray(p2.permute_device(dev_in)))
    np.testing.assert_array_equal(host.astype(np.uint32), dev)


def test_host_device_agree_1d():
    state = rng.integers(0, bb.P, size=p2.WIDTH, dtype=np.uint32)
    host = p2.permute_host(state.astype(np.uint64))
    dev = bb.np_from_monty(np.asarray(p2.permute_device(jnp.asarray(bb.np_to_monty(state)))))
    np.testing.assert_array_equal(host.astype(np.uint32), dev)


def test_permutation_is_not_identity_and_deterministic():
    state = np.arange(p2.WIDTH, dtype=np.uint64)
    out1 = p2.permute_host(state)
    out2 = p2.permute_host(state)
    np.testing.assert_array_equal(out1, out2)
    assert not np.array_equal(out1, state)
    # single-element sensitivity
    state2 = state.copy()
    state2[7] += 1
    assert not np.array_equal(p2.permute_host(state2), out1)


def test_hash_and_compress():
    d1 = p2.hash_elements_host([1, 2, 3])
    d2 = p2.hash_elements_host([1, 2, 3])
    d3 = p2.hash_elements_host([1, 2, 4])
    np.testing.assert_array_equal(d1, d2)
    assert not np.array_equal(d1, d3)
    c = p2.compress_host(d1, d3)
    assert c.shape == (8,)
    assert not np.array_equal(c, p2.compress_host(d3, d1))


def test_transcript_determinism_and_sensitivity():
    t1 = Transcript(b"test")
    t2 = Transcript(b"test")
    t1.append([5, 6, 7])
    t2.append([5, 6, 7])
    assert t1.sample_base() == t2.sample_base()
    assert t1.sample_ext() == t2.sample_ext()
    t3 = Transcript(b"test")
    t3.append([5, 6, 8])
    assert t3.sample_base() != Transcript(b"test").sample_base()
    # different label -> different stream
    t4 = Transcript(b"other")
    t4.append([5, 6, 7])
    t5 = Transcript(b"test")
    t5.append([5, 6, 7])
    assert t4.sample_base() != t5.sample_base()


def test_transcript_absorb_after_sample_changes_stream():
    t = Transcript(b"x")
    t.append([1])
    a = t.sample_base()
    t.append([2])
    b = t.sample_base()
    t2 = Transcript(b"x")
    t2.append([1])
    a2 = t2.sample_base()
    b2 = t2.sample_base()  # no absorb in between
    assert a == a2 and b != b2


def test_transcript_fork_merge():
    t = Transcript(b"main")
    t.append([42])
    f0, f1 = t.fork(0), t.fork(1)
    c0, c1 = f0.sample_ext(), f1.sample_ext()
    assert c0 != c1
    # deterministic merge: parent absorbs fork outputs
    t.append(np.asarray(c0, np.uint64))
    t.append(np.asarray(c1, np.uint64))
    v = t.sample_base()
    assert isinstance(v, int) and 0 <= v < bb.P


def test_sample_ext_pows():
    t = Transcript(b"pows")
    t.append([9])
    pows = t.sample_ext_pows(5)
    assert pows.shape == (5, 4)
    np.testing.assert_array_equal(pows[0], [1, 0, 0, 0])
    # pows[2] == pows[1] * pows[1]^... check pows[i+1] = pows[i]*alpha via ext mul
    from ceno_tpu.hash.transcript import _ext_mul_canon
    alpha = pows[1]
    for i in range(1, 4):
        np.testing.assert_array_equal(pows[i + 1], _ext_mul_canon(pows[i], alpha))


def test_pallas_leaf_sponge_and_compress_match_host():
    """The fused pallas Merkle kernels (hash/poseidon2_pallas.py) are
    byte-identical to the host sponge/compression (interpret mode on CPU;
    the real-TPU path is exercised by bench.py / the commit pipeline)."""
    import jax.numpy as jnp

    from ceno_tpu.hash import poseidon2_pallas as pp
    from ceno_tpu.pcs.merkle import host_build_levels, host_hash_leaves

    rng = np.random.default_rng(7)
    for c in (1, 8, 13):
        cols = rng.integers(0, bb.P, size=(c, 512), dtype=np.uint64)
        want = host_hash_leaves(cols)
        got = bb.np_from_monty(np.asarray(pp.leaf_sponge(
            jnp.asarray(bb.np_to_monty(cols.astype(np.uint32))),
            interpret=True,
        ))).astype(np.uint64)
        np.testing.assert_array_equal(want, got)
    leaves = host_hash_leaves(
        rng.integers(0, bb.P, size=(5, 1024), dtype=np.uint64)
    )
    want_lvl = host_build_levels(leaves)[0]
    got_lvl = bb.np_from_monty(np.asarray(pp.compress_level(
        jnp.asarray(bb.np_to_monty(leaves.astype(np.uint32))),
        interpret=True,
    ))).astype(np.uint64)
    np.testing.assert_array_equal(want_lvl, got_lvl)
