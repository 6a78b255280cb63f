"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: fibonacci e2e prove wall time (the reference's own benchmark
workload, ceno_zkvm/benches/fibonacci.rs — SURVEY.md §6) on the real TPU:
emulate on host, witgen on host, commit/tower/zerocheck/PCS-open with the
device kernels. vs_baseline = all-host (numpy) prover wall time / TPU wall
time at the same size — the in-environment stand-in for the reference CPU
prover (no Rust toolchain in this image).

Timing notes (axon backend): jax.block_until_ready does not wait through the
tunnel; prove() forces fetches at every transcript interaction so its wall
time is honest. First-ever run pays one-time XLA compiles (persistent-cached
in .jax_cache/): the timed prove is the second run.
"""

import json
import os
import subprocess
import sys
import time

# device path only for the big chips; small chips prove faster in numpy than
# the per-chip XLA programs can even be dispatched (see sumcheck/host_impl.py)
os.environ.setdefault("CENO_TPU_HOST_N", str(1 << 13))

N_ITERS = 20000  # fibonacci loop iterations (~120k guest instructions)


def _tpu_prove():
    import numpy as np
    from ceno_tpu.emulator import programs
    from ceno_tpu.pcs.basefold import BasefoldParams
    from ceno_tpu.zkvm.tables import ZKVMConfig
    from ceno_tpu.zkvm.scheme import keygen, prove, verify
    from ceno_tpu.zkvm.e2e import public_values_from_vm

    import sys

    def log(msg):
        print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)

    from ceno_tpu.emulator import native

    cfg = ZKVMConfig(shl_x_bits=10)
    params = BasefoldParams()  # production: blowup 8, 34 queries
    vm = programs.fibonacci_vm(N_ITERS)
    trace = native.run_trace(vm)
    log(f"emulated {trace.n} steps")
    pv = public_values_from_vm(vm)
    pk = keygen(vm.program, cfg, params)
    log("keygen done")
    import ceno_tpu.gkr.chip as chiplib

    orig = chiplib.prove_chip

    def timed(compiled, *a, **kw):
        t = time.time()
        r = orig(compiled, *a, **kw)
        log(f"  chip {compiled.name}: {time.time() - t:.1f}s")
        return r

    chiplib.prove_chip = timed
    proof = prove(pk, vm, trace, pv)  # warm (compiles)
    log("warm prove done")
    chiplib.prove_chip = orig
    t0 = time.time()
    proof = prove(pk, vm, trace, pv)
    dt = time.time() - t0
    log(f"timed prove: {dt:.1f}s")
    assert verify(pk.vk, proof)
    log("verify ok")
    return dt, trace.n


def _host_baseline() -> float:
    """All-host prove wall time in a subprocess (thresholds force numpy)."""
    code = (
        "import time\n"
        "from ceno_tpu.emulator import programs\n"
        "from ceno_tpu.pcs.basefold import BasefoldParams\n"
        "from ceno_tpu.zkvm.tables import ZKVMConfig\n"
        "from ceno_tpu.zkvm.scheme import keygen, prove\n"
        "from ceno_tpu.zkvm.e2e import public_values_from_vm\n"
        f"vm = programs.fibonacci_vm({N_ITERS})\n"
        "records = vm.run()\n"
        "pv = public_values_from_vm(vm)\n"
        "pk = keygen(vm.program, ZKVMConfig(shl_x_bits=10), BasefoldParams())\n"
        "t0 = time.time()\n"
        "proof = prove(pk, vm, records, pv)\n"
        "print('HOST_SECONDS', time.time() - t0)\n"
    )
    env = dict(os.environ)
    env["CENO_TPU_HOST_N"] = str(1 << 30)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("HOST_SECONDS"):
            return float(line.split()[1])
    raise RuntimeError(f"host baseline failed: {out.stderr[-2000:]}")


def main():
    tpu_dt, n_steps = _tpu_prove()
    cache = os.path.join(os.path.dirname(__file__), ".bench_host_baseline.json")
    host_dt = None
    try:
        if os.path.exists(cache):
            saved = json.load(open(cache))
            if saved.get("n_iters") == N_ITERS:
                host_dt = saved["seconds"]
        if host_dt is None:
            host_dt = _host_baseline()
            json.dump({"n_iters": N_ITERS, "seconds": host_dt}, open(cache, "w"))
        ratio = round(host_dt / tpu_dt, 2)
    except Exception:
        ratio = None
    print(
        json.dumps(
            {
                "metric": "fibonacci_e2e_prove_wall",
                "value": round(tpu_dt, 2),
                "unit": f"s ({n_steps} steps)",
                "vs_baseline": ratio,
            }
        )
    )


if __name__ == "__main__":
    main()
