"""Run bench.py with an audit hook recording every .jax_cache file opened.

Used to prune .jax_cache to exactly the entries the driver bench needs before
committing it (the full cache accumulates stale entries from development and
is far too large to commit wholesale).

Usage: python tools/bench_traced.py [out_list]
"""

import os
import sys

_OUT = sys.argv[1] if len(sys.argv) > 1 else ".jax_cache_used.txt"
_seen = set()
_f = open(_OUT, "a", buffering=1)


def _hook(event, args):
    if event == "open":
        path = args[0]
        if isinstance(path, bytes):
            path = path.decode(errors="replace")
        if isinstance(path, str) and ".jax_cache" in path and path not in _seen:
            _seen.add(path)
            _f.write(path + "\n")


sys.addaudithook(_hook)

sys.argv = ["bench.py"]
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

bench.main()
