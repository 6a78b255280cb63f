"""Shard-parallel (P1 / multi-host) scaling measurement.

Shards are share-nothing by construction (independent transcripts; the only
cross-shard coupling is the public-value chain + EC-sum stitching done by the
VERIFIER), so an N-host deployment assigns shards to hosts and its wall time
is max(per-shard prove) + stitching verify. This script measures that on the
one real chip: split the 2^20-step fibonacci into 2 shards, prove each with
per-shard timing, verify the stitched chain, and report the projected 2-host
scaling efficiency against the single-shard monolithic prove:

    efficiency_2host = T_monolithic / (2 * (max(T_shard) + T_stitch))

Prints ONE JSON line. Like bench.py: the first prove warms compiles; the
reported numbers come from a second, warm pass.
"""

import json
import os
import sys
import time

os.environ.setdefault("CENO_TPU_HOST_N", str(1 << 13))

N_ITERS = 174760  # ~2^20 steps


def log(msg):
    print(f"[shards {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    from ceno_tpu.emulator import programs, native
    from ceno_tpu.zkvm.scheme import keygen
    from ceno_tpu.zkvm.shard import prove_shards, verify_shards, plan_shards
    from ceno_tpu.zkvm.tables import ZKVMConfig
    from ceno_tpu.zkvm.chips.opcodes import TraceView
    import ceno_tpu.zkvm.scheme as scheme

    cfg = ZKVMConfig(shl_x_bits=10)
    vm = programs.fibonacci_vm(N_ITERS)
    t0 = time.time()
    trace = native.run_trace(vm)
    log(f"emulated {trace.n} steps in {time.time() - t0:.1f}s")
    view = TraceView.from_records(trace) if not isinstance(trace, TraceView) else trace
    pk = keygen(vm.program, cfg)
    max_steps = (trace.n + 1) // 2 + 8

    shard_walls = []
    orig_prove = scheme.prove

    def timed_prove(*a, **kw):
        t = time.time()
        out = orig_prove(*a, **kw)
        shard_walls.append(time.time() - t)
        log(f"  shard {len(shard_walls) - 1} prove: {shard_walls[-1]:.1f}s")
        return out

    scheme.prove = timed_prove
    try:
        log("warm pass (compiles)...")
        t0 = time.time()
        sp = prove_shards(pk, vm, view, max_steps)
        log(f"warm shards done in {time.time() - t0:.1f}s ({sp.n_shards} shards)")
        shard_walls.clear()
        t0 = time.time()
        sp = prove_shards(pk, vm, view, max_steps)
        total = time.time() - t0
    finally:
        scheme.prove = orig_prove
    t0 = time.time()
    assert verify_shards(pk.vk, sp)
    stitch = time.time() - t0
    log(f"stitched verify ok in {stitch:.1f}s")

    mono = None
    try:
        mono = json.load(open("/tmp/bench8.json"))["value"]
    except Exception:
        pass
    worst = max(shard_walls)
    projected_2host = worst + stitch
    eff = round(mono / (2 * projected_2host), 3) if mono else None
    balance = round(min(shard_walls) / worst, 3)
    print(json.dumps({
        "metric": "fibonacci_2p20_2shard_scaling",
        "n_shards": sp.n_shards,
        "shard_prove_walls_s": [round(w, 2) for w in shard_walls],
        "pipelined_total_s": round(total, 2),
        "stitch_verify_s": round(stitch, 2),
        "projected_2host_wall_s": round(projected_2host, 2),
        "monolithic_wall_s": mono,
        "strong_scaling_efficiency_vs_monolithic": eff,
        "shard_load_balance": balance,
        "note": (
            "shards are share-nothing (zero cross-host traffic; stitching is "
            "verifier-side), so multi-host wall = max(shard)+stitch. Strong "
            "scaling at 2^20 is bounded by per-shard FIXED work (static "
            "tables, commit floor, cross-shard RAM/EC chips) — each half-"
            "size shard costs well over half the monolithic prove. At the "
            "reference's default shard size (2^29 cycles/shard) fixed work "
            "vanishes relative to per-step work and efficiency approaches "
            "the load balance."
        ),
    }))


if __name__ == "__main__":
    main()
