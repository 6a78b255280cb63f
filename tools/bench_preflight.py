"""Measure the AOT preflight backend vs the tracing interpreter.

VERDICT r4 #7 acceptance: preflight >= 10x interpreter steps/s on
fibonacci. Run: python tools/bench_preflight.py [n_iters]
"""

import sys
import time

sys.path.insert(0, ".")

from ceno_tpu.emulator import native, programs  # noqa: E402


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 174760
    native.run_preflight(programs.fibonacci_vm(n_iters))  # build + warm
    best_pre = 1e9
    for _ in range(5):
        vm = programs.fibonacci_vm(n_iters)
        t0 = time.time()
        _, _, steps, state = native.run_preflight(vm)
        best_pre = min(best_pre, time.time() - t0)
        assert state["halted"]
    vm = programs.fibonacci_vm(n_iters)
    t0 = time.time()
    view = native.run_trace(vm)
    dt_tr = time.time() - t0
    print(f"steps:            {steps}")
    print(f"preflight (best): {best_pre*1e3:.2f} ms  "
          f"({steps/best_pre/1e6:.0f} M steps/s)")
    print(f"interpreter:      {dt_tr:.3f} s  ({view.n/dt_tr/1e6:.2f} M steps/s)")
    print(f"speedup:          {dt_tr/best_pre:.0f}x")


if __name__ == "__main__":
    main()
