"""Benchmark driver: prints ONE JSON line with the headline metric.

Round-1 headline: fused prover-kernel throughput on the real TPU — Basefold
commit (möbius + NTT + Poseidon2 Merkle) plus a batched zerocheck sumcheck
round — reported as BabyBear field-muls/s. vs_baseline = speedup over the
same work done by the host numpy reference implementation (the in-environment
stand-in for the reference CPU prover; no Rust toolchain in this image).

Timing notes (axon backend): jax.block_until_ready does NOT wait for device
completion through the tunnel, so every timed section forces a device->host
fetch. First run pays one-time XLA compiles (minutes, persistent-cached in
.jax_cache/); steady-state numbers come from the cached programs.
"""

import json
import time

import numpy as np

LOG_ROWS = 16
N_COLS = 32
BLOWUP_LOG = 2
SC_LOG_ROWS = 20


def _fetch(x):
    import jax

    return np.asarray(jax.tree_util.tree_leaves(x)[0])


def _bench_commit():
    import jax.numpy as jnp
    from ceno_tpu.fields import babybear as bb
    from ceno_tpu.pcs import basefold
    from ceno_tpu.pcs.basefold import BasefoldParams

    rng = np.random.default_rng(7)
    params = BasefoldParams(blowup_log=BLOWUP_LOG)
    cols = jnp.asarray(
        bb.np_to_monty(
            rng.integers(0, bb.P, size=(N_COLS, 1 << LOG_ROWS), dtype=np.uint32)
        )
    )
    c = basefold.commit(cols, params)  # warm (root fetch inside)
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        c = basefold.commit(cols, params)
    dt = (time.time() - t0) / reps
    m = 1 << (LOG_ROWS + BLOWUP_LOG)
    ntt_muls = N_COLS * m * (m.bit_length() - 1)
    perms = m * ((N_COLS + 7) // 8 + 2)  # leaves + tree
    pose_muls = perms * 900
    return dt, ntt_muls + pose_muls


def _bench_sumcheck_round():
    import jax
    import jax.numpy as jnp
    from ceno_tpu.fields import babybear as bb, ext4
    from ceno_tpu.mle import ops
    from ceno_tpu.sumcheck import terms as T

    rng = np.random.default_rng(8)
    n = 1 << SC_LOG_ROWS
    n_cols = 16
    cols = jnp.asarray(
        bb.np_to_monty(rng.integers(0, bb.P, size=(n_cols, n), dtype=np.uint32))
    )
    rt = jnp.asarray(
        bb.np_to_monty(rng.integers(0, bb.P, size=(SC_LOG_ROWS, 4), dtype=np.uint32))
    )
    n_terms = 8
    bidx = jnp.asarray(
        np.array([[i % n_cols, (i + 3) % n_cols] for i in range(n_terms)], np.int32)
    )
    eidx = jnp.asarray(np.zeros((n_terms, 1), np.int32))
    scalars = jnp.asarray(
        bb.np_to_monty(rng.integers(0, bb.P, size=(4, n_terms), dtype=np.uint32))
    )

    @jax.jit
    def round_step(cols, rt, bidx, eidx, scalars):
        eq = ops.build_eq(rt)
        base_bank = jnp.concatenate([cols, bb.ones((1, n))], axis=0)
        ext_bank = jnp.stack([eq, ext4.ones((n,))], axis=1)
        return T.round_evals(base_bank, ext_bank, bidx, eidx, scalars, deg=3)

    _fetch(round_step(cols, rt, bidx, eidx, scalars))
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        out = _fetch(round_step(cols, rt, bidx, eidx, scalars))
    dt = (time.time() - t0) / reps
    # eq build: n ext muls (19); per term per eval point: base mul + ext-base + sums
    muls = n * 19 + n_terms * 4 * (n // 2) * (1 + 4 + 19 / (n // 2) + 2)
    return dt, muls


def _bench_host_reference():
    """Same kernels in host numpy (per-row cost, measured small then scaled)."""
    from ceno_tpu.fields import babybear as bb
    from ceno_tpu.hash import poseidon2 as p2

    rng = np.random.default_rng(7)
    n = 1 << 13
    p = np.uint64(bb.P)
    cols = rng.integers(0, bb.P, size=(N_COLS, n), dtype=np.uint64)
    t0 = time.time()
    x = cols.copy()
    for j in range(n.bit_length() - 1):
        blk = 1 << j
        x = x.reshape(N_COLS, n // (2 * blk), 2, blk)
        x[:, :, 1, :] = (x[:, :, 1, :] + p - x[:, :, 0, :]) % p
        x = x.reshape(N_COLS, n)
    state = np.zeros((16, n), np.uint64)
    for off in range(0, N_COLS, 8):
        chunk = x[off : off + 8]
        state[: chunk.shape[0]] = (state[: chunk.shape[0]] + chunk) % p
        state = p2.permute_host(state)
    dt = time.time() - t0
    return dt / n


def main():
    commit_dt, commit_muls = _bench_commit()
    sc_dt, sc_muls = _bench_sumcheck_round()
    total_dt = commit_dt + sc_dt
    total_muls = commit_muls + sc_muls
    host_per_row = _bench_host_reference()
    host_dt = host_per_row * ((1 << (LOG_ROWS + BLOWUP_LOG)) + (1 << SC_LOG_ROWS))
    print(
        json.dumps(
            {
                "metric": "prover_kernel_field_muls_per_s",
                "value": round(total_muls / total_dt / 1e9, 3),
                "unit": "Gmul/s",
                "vs_baseline": round(host_dt / total_dt, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
