"""NTT, Merkle, and Basefold PCS roundtrip tests."""

import numpy as np
import jax.numpy as jnp

from ceno_tpu.fields import babybear as bb
from ceno_tpu.fields import ext4_host as exth
from ceno_tpu.hash import Transcript
from ceno_tpu.pcs import ntt, merkle, basefold
from ceno_tpu.pcs.basefold import BasefoldParams, Claim

rng = np.random.default_rng(31)


def test_ntt_matches_naive():
    log_m = 5
    m = 1 << log_m
    coeffs = rng.integers(0, bb.P, size=(2, m), dtype=np.uint32)
    out = bb.np_from_monty(
        np.asarray(ntt.ntt_natural(jnp.asarray(bb.np_to_monty(coeffs))))
    )
    w = ntt.bb.two_adic_root(log_m)
    for c in range(2):
        for i in [0, 1, 7, 31]:
            x = pow(w, i, bb.P)
            expect = 0
            for j in range(m):
                expect = (expect + int(coeffs[c, j]) * pow(x, j, bb.P)) % bb.P
            assert int(out[c, i]) == expect, (c, i)


def test_mobius_zeta_inverse():
    n = 1 << 6
    v = jnp.asarray(bb.np_to_monty(rng.integers(0, bb.P, size=(3, n), dtype=np.uint32)))
    back = ntt.zeta(ntt.mobius(v))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(v))


def test_encode_agrees_with_mle_eval():
    """Codeword positions in the data domain must equal f's evals (RS is systematic
    up to ordering) — weaker smoke check: encoding is injective + fold relation
    is checked end-to-end in the basefold roundtrip below."""
    n = 1 << 4
    v = jnp.asarray(bb.np_to_monty(rng.integers(0, bb.P, size=(1, n), dtype=np.uint32)))
    cw = ntt.encode(v, blowup_log=1)
    assert cw.shape == (1, 2 * n)


def test_merkle_roundtrip():
    m = 64
    cols = rng.integers(0, bb.P, size=(5, m), dtype=np.uint32)
    leaves, levels = merkle.hash_and_tree(jnp.asarray(bb.np_to_monty(cols)))
    tree = merkle.MerkleTree.from_device(leaves, levels)
    # host build agrees
    tree_h = merkle.MerkleTree.build_host(cols.astype(np.uint64))
    np.testing.assert_array_equal(tree.root, tree_h.root)
    for idx in [0, 1, 31, 63]:
        path = tree.open_path(idx)
        assert merkle.verify_path(tree.root, idx, cols[:, idx], path)
        assert not merkle.verify_path(tree.root, idx, cols[:, idx] + 1, path)


def _pcs_roundtrip(n_vars, n_cols, k_points, params):
    n = 1 << n_vars
    cols = rng.integers(0, bb.P, size=(n_cols, n), dtype=np.uint32)
    committed = basefold.commit(jnp.asarray(bb.np_to_monty(cols)), params)
    points = rng.integers(0, bb.P, size=(k_points, n_vars, 4), dtype=np.uint32).astype(np.uint64)

    def host_eval(col, point):
        cur = exth.from_base(col.astype(np.uint64))
        for j in range(n_vars - 1, -1, -1):
            half = cur.shape[0] // 2
            lo, hi = cur[:half], cur[half:]
            cur = exth.add(lo, exth.mul(point[j][None, :], exth.sub(hi, lo)))
        return cur[0]

    claims = []
    for j in range(n_cols):
        kk = j % k_points
        claims.append(Claim(kk, j, host_eval(cols[j], points[kk])))

    tp = Transcript(b"pcs")
    tp.append(committed.root)
    proof = basefold.open_batch(committed, points, claims, tp, params)
    tv = Transcript(b"pcs")
    tv.append(committed.root)
    assert basefold.verify_batch(
        committed.root, n_vars, n_cols, points, claims, proof, tv, params
    )
    return committed, points, claims, proof


def test_basefold_roundtrip_small():
    params = BasefoldParams(blowup_log=1, n_queries=6, stop_size=16)
    _pcs_roundtrip(n_vars=6, n_cols=3, k_points=2, params=params)


def test_basefold_roundtrip_multi_level():
    params = BasefoldParams(blowup_log=2, n_queries=8, stop_size=16)
    _pcs_roundtrip(n_vars=8, n_cols=5, k_points=3, params=params)


def test_basefold_rejects_wrong_claim():
    params = BasefoldParams(blowup_log=1, n_queries=6, stop_size=16)
    n_vars, n_cols = 6, 2
    n = 1 << n_vars
    cols = rng.integers(0, bb.P, size=(n_cols, n), dtype=np.uint32)
    committed = basefold.commit(jnp.asarray(bb.np_to_monty(cols)), params)
    points = rng.integers(0, bb.P, size=(1, n_vars, 4), dtype=np.uint32).astype(np.uint64)
    claims = [Claim(0, j, exth.from_base(123 + j)) for j in range(n_cols)]  # wrong
    tp = Transcript(b"pcs")
    tp.append(committed.root)
    proof = basefold.open_batch(committed, points, claims, tp, params)
    tv = Transcript(b"pcs")
    tv.append(committed.root)
    try:
        basefold.verify_batch(
            committed.root, n_vars, n_cols, points, claims, proof, tv, params
        )
        assert False, "wrong claims must not verify"
    except (basefold.PCSError, Exception):
        pass


def test_basefold_rejects_tampered_query():
    params = BasefoldParams(blowup_log=1, n_queries=4, stop_size=16)
    committed, points, claims, proof = _pcs_roundtrip(6, 2, 1, params)
    proof.queries[0].base_rows[0, 0] = (proof.queries[0].base_rows[0, 0] + 1) % bb.P
    tv = Transcript(b"pcs")
    tv.append(committed.root)
    try:
        basefold.verify_batch(
            committed.root, 6, 2, points, claims, proof, tv, params
        )
        assert False
    except basefold.PCSError:
        pass
