"""GL device commit path (gl/device.py): the 2-limb NTT encode and the
Poseidon2-GL Merkle kernels are byte-identical to the host mirrors.

Equality runs in EAGER mode here: XLA's CPU pipeline compiles chained
2-limb arithmetic pathologically (see fields/goldilocks.py mul fence
note), so the jitted path is TPU-gated (gl/pcs._use_device) and exercised
on real hardware (tools/bench_gl_device.py / the round's TPU drives)."""

import jax
import numpy as np

from ceno_tpu.fields import gl_host as gl
from ceno_tpu.gl import device as gldev
from ceno_tpu.gl import pcs as glp
from ceno_tpu.gl import poseidon2 as glp2


def test_permute_device_matches_host_eager():
    rng = np.random.default_rng(2)
    st = rng.integers(0, gl.P, size=(8, 8), dtype=np.uint64)
    with jax.disable_jit():
        got = gldev.unpack(gldev.permute_device(gldev.pack_dev(st)))
    np.testing.assert_array_equal(glp2.permute_host(st), got)


def test_encode_dev_matches_host_eager():
    rng = np.random.default_rng(3)
    cols = rng.integers(0, gl.P, size=(5, 32), dtype=np.uint64)
    with jax.disable_jit():
        got = gldev.unpack(
            gldev.encode_dev.__wrapped__(gldev.pack_dev(cols), blowup_log=2)
        )
    np.testing.assert_array_equal(glp.encode(cols, 2), got)


def test_tree_dev_matches_host_eager():
    rng = np.random.default_rng(4)
    cw = rng.integers(0, gl.P, size=(7, 32), dtype=np.uint64)
    want = glp.GlTree.build(cw)
    with jax.disable_jit():
        levels = gldev.hash_and_tree_dev.__wrapped__(gldev.pack_dev(cw))
    got = glp.GlTree([gldev.unpack(l) for l in levels])
    assert len(want.levels) == len(got.levels)
    for a, b in zip(want.levels, got.levels):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(want.root, got.root)
    for idx in (0, 3, 31):
        np.testing.assert_array_equal(want.open_path(idx), got.open_path(idx))


def test_device_gate_is_opt_in_tpu_only(monkeypatch):
    # the device path is opt-in (CENO_GL_DEVICE) and TPU-backend-only
    monkeypatch.delenv("CENO_GL_DEVICE", raising=False)
    monkeypatch.setenv("CENO_GL_HOST_N", "0")
    assert not glp._use_device(1 << 16)
    monkeypatch.setenv("CENO_GL_DEVICE", "1")
    assert glp._use_device(1 << 16) == (jax.default_backend() == "tpu")
    monkeypatch.setenv("CENO_GL_HOST_N", str(1 << 30))
    assert not glp._use_device(1 << 16)
