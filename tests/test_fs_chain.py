"""Global FS transcript chain in-circuit (gkr/fs_chain.py): the recording
transcript is bit-identical to a live Transcript, the duplex-rows chip set
is bus-balanced and MockProver-satisfied, sampled challenges land on the
challenge lookup table (incl. sample_ext_pows chains), and tampering any
absorbed element or published challenge breaks the chain."""

import numpy as np

from ceno_tpu.fields import babybear as bb
from ceno_tpu.fields import ext4_host as exth
from ceno_tpu.gkr import fs_chain as F
from ceno_tpu.gkr.circuit_builder import CircuitBuilder, RAM_CUSTOM
from ceno_tpu.gkr.chip import compile_chip
from ceno_tpu.gkr.mock import MockProver
from ceno_tpu.hash.transcript import Transcript
from ceno_tpu.mle import expression as E
from ceno_tpu.gkr import gadgets as G

rng = np.random.default_rng(41)


def _drive(t):
    """A realistic schedule: absorbs of odd lengths + ext samples + pows +
    registered absorbed values (ext and base)."""
    rec = isinstance(t, F.ChainTranscript)
    t.append(rng.integers(0, bb.P, size=13, dtype=np.uint64))
    if rec:
        cid1, c1 = t.sample_ext_chal()
    else:
        c1 = np.array(t.sample_ext(), np.uint64)
    ax = rng.integers(0, bb.P, size=4, dtype=np.uint64)
    ab = int(rng.integers(0, bb.P))
    if rec:
        t.append_ext_chal(ax)       # an absorbed proof ext, table-bound
        t.append_base_chal(ab)      # an absorbed base element
    else:
        t.append(ax)
        t.append([ab])
    t.append(rng.integers(0, bb.P, size=5, dtype=np.uint64))
    if rec:
        cid0, pows = t.sample_ext_pows_chal(3)
    else:
        pows = t.sample_ext_pows(3)
    t.append(rng.integers(0, bb.P, size=1, dtype=np.uint64))
    if rec:
        cid2, c2 = t.sample_ext_chal()
    else:
        c2 = np.array(t.sample_ext(), np.uint64)
    return c1, pows, c2


def _mkset(name, compiled, cb, wit, fixed=None):
    k = wit.shape[1]
    n = max(2, 1 << max(0, (k - 1).bit_length()))
    if wit.shape[1] < n:
        wit = np.pad(wit, ((0, 0), (0, n - k)))
    if fixed is None:
        fixed = np.zeros((0, n), np.uint64)
    elif fixed.shape[1] < n:
        fixed = np.pad(fixed, ((0, 0), (0, n - fixed.shape[1])))
    return (compiled, cb, wit, fixed, np.zeros(0), k)


def _consumer_chip():
    """A minimal consumer: one row looks up (cid, value) on LK_AGG_CHAL."""
    cb = CircuitBuilder("chal_consumer")
    cid = cb.create_witin("cid")
    v = G.ext_witness(cb, "v")
    cb.lk_record(F.LK_AGG_CHAL, [cid] + v.c)
    return cb, compile_chip(cb)


def _build_sets(tamper=None):
    rng2 = np.random.default_rng(41)
    globals()["rng"] = rng2  # deterministic replay for both transcripts
    chips = F.build_fs_chain_chips()
    t = F.ChainTranscript(b"fs-chain-test")
    c1, pows, c2 = _drive(t)

    # consumers: look up c1 once, alpha^2 twice, c2 once, plus the two
    # absorbed values (cids: c1=0, absx=1, absb=2, pow base=3, pows=4..6,
    # c2=7 in registration order)
    reg = t.registry
    absx_cid, absx_v = reg.absx_rows[0][0], reg.absx_rows[0][2]
    absb_cid, absb_v = reg.absb_rows[0][0], reg.absb_rows[0][2]
    ccb, ccompiled = _consumer_chip()
    uses = [(0, c1), (6, pows[2]), (6, pows[2]), (7, c2),
            (absx_cid, absx_v),
            (absb_cid, np.array([absb_v, 0, 0, 0], np.uint64))]
    for cid, _v in uses:
        t.use(cid)
    cw = np.zeros((len(ccb.wit_names), len(uses)), np.uint64)
    for r, (cid, v) in enumerate(uses):
        cw[ccb.wit_names.index("cid"), r] = cid
        for j in range(4):
            cw[ccb.wit_names.index(f"v_{j}"), r] = v[j]
    sets = t.finalize(chips)
    out = [_mkset(n, comp, cb, wit, fx) for n, comp, cb, wit, fx in sets]
    out.append(_mkset("consumer", ccompiled, ccb, cw))
    return chips, t, out, (c1, pows, c2)


def test_chain_transcript_matches_live():
    globals()["rng"] = np.random.default_rng(41)
    t1 = F.ChainTranscript(b"fs-chain-test")
    r1 = _drive(t1)
    globals()["rng"] = np.random.default_rng(41)
    t2 = Transcript(b"fs-chain-test")
    r2 = _drive(t2)
    assert np.array_equal(t1.state, t2.state)
    for a, b in zip(r1, r2):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    # post-recording sampling still matches
    assert t1.sample_ext() == t2.sample_ext()


def test_fs_chain_mock_satisfied():
    chips, t, sets, _ = _build_sets()
    assert MockProver.assert_satisfied(sets) == []


def test_fs_chain_tamper_absorb_breaks():
    chips, t, sets, _ = _build_sets()
    # flip one absorbed element (fs_abs supply row): the duplex row's block
    # read no longer balances
    names = [s[1].name for s in sets]
    ai = names.index("fs_abs_supply")
    compiled, cb, wit, fx, inst, k = sets[ai]
    bad = wit.copy()
    vi = cb.wit_names.index("v")
    bad[vi, 0] = (int(bad[vi, 0]) + 1) % bb.P
    sets[ai] = (compiled, cb, bad, fx, inst, k)
    assert MockProver.assert_satisfied(sets, raise_on_error=False)


def test_fs_chain_tamper_challenge_breaks():
    chips, t, sets, _ = _build_sets()
    # flip a published challenge value in the table: its sample-slot read
    # no longer matches the duplex row's write
    names = [s[1].name for s in sets]
    ci = names.index("fs_chal_table")
    compiled, cb, wit, fx, inst, k = sets[ci]
    bad = wit.copy()
    vi = cb.wit_names.index("v0")
    bad[vi, 0] = (int(bad[vi, 0]) + 1) % bb.P
    sets[ci] = (compiled, cb, bad, fx, inst, k)
    assert MockProver.assert_satisfied(sets, raise_on_error=False)


def test_fs_chain_tamper_pow_breaks():
    chips, t, sets, _ = _build_sets()
    # flip one pow-chain link value: either the chain or the table breaks
    names = [s[1].name for s in sets]
    pi = names.index("fs_pow_rows")
    compiled, cb, wit, fx, inst, k = sets[pi]
    bad = wit.copy()
    vi = cb.wit_names.index("v_0")
    bad[vi, 1] = (int(bad[vi, 1]) + 1) % bb.P
    sets[pi] = (compiled, cb, bad, fx, inst, k)
    assert MockProver.assert_satisfied(sets, raise_on_error=False)
