"""Cross-process AOT executable cache for jitted kernels.

jax's persistent compilation cache (jaxcfg.py) removes the XLA COMPILE cost
across processes, but TRACING + lowering a big program is pure Python and
still costs seconds-to-minutes per fresh process (measured: a fresh-process
2^20 prove spends ~10+ minutes tracing, ~30s computing). This module caches
the final compiled executable itself (jax.experimental.serialize_executable)
keyed by a function key + the dynamic-argument avals, so a warm process
skips tracing entirely: deserialize_and_load takes ~0.1s per program.

Safety model: every key is salted with a digest of ALL ceno_tpu python
sources + the jax/jaxlib versions + the backend platform AND a
machine/runtime fingerprint (CPU feature flags + the backend's
platform_version), so a code change, a jax upgrade, or moving the cache
directory to a different machine invalidates every cached executable.
Aval mismatches fail synchronously at call time and fall back to jit.
Dispatch-level failures of a deserialized executable (e.g. a kernel
symbol missing from this runtime) surface ASYNCHRONOUSLY — at a later
buffer fetch, not at the call — so entries loaded from disk are probed
once: the first call's smallest output leaf is fetched to host before
the executable is admitted to the in-memory cache; a probe failure
deletes the on-disk entry and falls back to the normal jit path.

Usage — drop-in for jax.jit at module level:

    from ..utils import aotcache as aot

    @aot.jit
    def kernel(x): ...

    @aot.jit(static_argnames=("deg",))
    def kernel2(x, *, deg): ...

and for per-object closures (the program depends on closed-over data),
pass an explicit key that identifies the closure contents:

    fn = aot.wrap(build, key=f"records:{chip_digest}")

Statics MUST be passed as keyword arguments at call sites (the dynamic
arguments may be positional or keyword). Opt out with CENO_TPU_NO_AOT=1.
"""

from __future__ import annotations

import functools
import hashlib
import os
import pickle
import sys
import threading

import jax
import numpy as np

_MEM: dict = {}
_LOCK = threading.Lock()
_SALT = None
_DIR = None


def _disabled() -> bool:
    # Read the env var dynamically: dryrun_multichip (a correctness check
    # for which the executable cache buys nothing) sets it after import.
    return bool(os.environ.get("CENO_TPU_NO_AOT"))


def _machine_fingerprint(h) -> None:
    """Feed a machine/runtime fingerprint into the salt digest.

    Serialized executables embed machine code specialized to the host's CPU
    features and the XLA runtime that compiled them; an entry produced on a
    different machine or XLA build can dispatch-fail (or SIGILL) here."""
    try:
        import jaxlib

        h.update(jaxlib.__version__.encode())
    except Exception:
        pass
    try:
        h.update(jax.extend.backend.get_backend().platform_version.encode())
    except Exception:
        pass
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    h.update(line.encode())
                    break
    except OSError:
        import platform

        h.update(platform.processor().encode())


def _pkg_salt() -> str:
    """Digest of every ceno_tpu source file + jax version + platform +
    machine/runtime fingerprint."""
    global _SALT
    if _SALT is None:
        h = hashlib.sha256()
        pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        for root, dirs, files in sorted(os.walk(pkg)):
            dirs.sort()
            for fn in sorted(files):
                if fn.endswith(".py") or fn.endswith(".cpp"):
                    path = os.path.join(root, fn)
                    h.update(path.encode())
                    with open(path, "rb") as f:
                        h.update(f.read())
        h.update(jax.__version__.encode())
        try:
            h.update(jax.default_backend().encode())
        except Exception:
            pass
        _machine_fingerprint(h)
        _SALT = h.hexdigest()[:20]
    return _SALT


def _cache_dir() -> str:
    global _DIR
    if _DIR is None:
        platform = os.environ.get("JAX_PLATFORMS", "default").split(",")[0] or "default"
        base = os.environ.get(
            "CENO_TPU_CACHE_DIR",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
                ".jax_cache",
                platform,
            ),
        )
        _DIR = os.path.join(base, "aot")
        os.makedirs(_DIR, exist_ok=True)
    return _DIR


def _leaf_sig(x):
    if hasattr(x, "shape") and hasattr(x, "dtype"):
        return (tuple(x.shape), str(x.dtype))
    return ("py", type(x).__name__)


def _sig(args, kwargs):
    leaves, treedef = jax.tree_util.tree_flatten((args, kwargs))
    return (tuple(_leaf_sig(v) for v in leaves), str(treedef))


def _probe_fetch(out) -> None:
    """Force a device->host fetch of the smallest output leaf so async
    dispatch failures (stale deserialized executable) raise here.
    block_until_ready does NOT flush errors through the axon tunnel;
    np.asarray does (CLAUDE.md environment quirks)."""
    leaves = [
        l for l in jax.tree_util.tree_leaves(out)
        if hasattr(l, "shape") and hasattr(l, "dtype")
    ]
    if not leaves:
        return
    smallest = min(leaves, key=lambda l: int(np.prod(l.shape)) if l.shape else 1)
    np.asarray(smallest)


class _AotFn:
    __slots__ = ("_fn", "_jitted", "_key", "_statics", "__wrapped__")

    def __init__(self, fn, key, static_argnames=()):
        self._fn = fn
        self._statics = tuple(static_argnames)
        self._jitted = jax.jit(fn, static_argnames=self._statics or None)
        self._key = key
        self.__wrapped__ = fn

    def __call__(self, *args, **kwargs):
        if _disabled():
            return self._jitted(*args, **kwargs)
        statics = {k: kwargs[k] for k in self._statics if k in kwargs}
        dyn_kwargs = {k: v for k, v in kwargs.items() if k not in statics}
        key = (self._key, repr(sorted(statics.items())), _sig(args, dyn_kwargs))
        compiled = _MEM.get(key)
        if compiled is None:
            compiled, path = self._load_or_compile(key, args, kwargs)
            if path is not None:
                # Deserialized from disk: probe before admitting. Dispatch
                # errors of a stale executable surface asynchronously at a
                # later buffer fetch, so force a (tiny) fetch NOW.
                try:
                    out = compiled(*args, **dyn_kwargs)
                    _probe_fetch(out)
                except Exception:
                    try:
                        os.unlink(path)
                    except OSError:
                        pass
                    return self._jitted(*args, **kwargs)
                with _LOCK:
                    _MEM[key] = compiled
                return out
            with _LOCK:
                _MEM[key] = compiled
        try:
            return compiled(*args, **dyn_kwargs)
        except Exception:
            # aval mismatch: fall back loudly-safe
            with _LOCK:
                _MEM.pop(key, None)
            return self._jitted(*args, **kwargs)

    def _load_or_compile(self, key, args, kwargs):
        """Returns (compiled, path-if-loaded-from-disk-else-None)."""
        from jax.experimental import serialize_executable as se

        digest = hashlib.sha256(
            (_pkg_salt() + repr(key)).encode()
        ).hexdigest()[:32]
        path = os.path.join(_cache_dir(), digest + ".aotx")
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    payload = pickle.load(f)
                return se.deserialize_and_load(*payload), path
            except Exception:
                pass
        compiled = self._jitted.lower(*args, **kwargs).compile()
        try:
            payload = se.serialize(compiled)
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                pickle.dump(payload, f)
            os.replace(tmp, path)
        except Exception:
            pass
        return compiled, None

    # conveniences mirroring jax.jit API surface used in-repo
    def lower(self, *args, **kwargs):
        return self._jitted.lower(*args, **kwargs)


def jit(fn=None, *, static_argnames=(), key=None):
    """Drop-in for jax.jit(fn, static_argnames=...) with AOT caching."""
    if fn is None:
        return functools.partial(jit, static_argnames=static_argnames, key=key)
    k = key or f"{fn.__module__}.{getattr(fn, '__qualname__', fn.__name__)}"
    return _AotFn(fn, k, static_argnames)


def wrap(fn, *, key, static_argnames=()):
    """AOT-cached jit of a closure; ``key`` must identify the closed-over
    data (e.g. a digest of the chip structure)."""
    return _AotFn(fn, key, static_argnames)
