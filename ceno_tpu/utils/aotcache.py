"""Cross-process AOT executable cache for jitted kernels.

jax's persistent compilation cache (jaxcfg.py) removes the XLA COMPILE cost
across processes, but TRACING + lowering a big program is pure Python and
still costs seconds-to-minutes per fresh process (measured: a fresh-process
2^20 prove spends ~10+ minutes tracing, ~30s computing). This module caches
the final compiled executable itself (jax.experimental.serialize_executable)
keyed by a function key + the dynamic-argument avals, so a warm process
skips tracing entirely: deserialize_and_load takes ~0.1s per program.

Safety model: every key is salted with a digest of ALL ceno_tpu python
sources + the jax version + the backend platform, so any code change
invalidates every cached executable. A stale or mismatched entry can only
fail loudly (jax validates input avals at call time); any load/call error
falls back to the normal jit path.

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

_DISABLED = bool(os.environ.get("CENO_TPU_NO_AOT"))
_MEM: dict = {}
_LOCK = threading.Lock()
_SALT = None
_DIR = None


def _pkg_salt() -> str:
    """Digest of every ceno_tpu source file + jax version + platform."""
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


class _AotFn:
    __slots__ = ("_fn", "_jitted", "_key", "_statics", "__wrapped__")

    def __init__(self, fn, key, static_argnames=()):
        self._fn = fn
        self._statics = tuple(static_argnames)
        self._jitted = jax.jit(fn, static_argnames=self._statics or None)
        self._key = key
        self.__wrapped__ = fn

    def __call__(self, *args, **kwargs):
        if _DISABLED:
            return self._jitted(*args, **kwargs)
        statics = {k: kwargs[k] for k in self._statics if k in kwargs}
        dyn_kwargs = {k: v for k, v in kwargs.items() if k not in statics}
        key = (self._key, repr(sorted(statics.items())), _sig(args, dyn_kwargs))
        compiled = _MEM.get(key)
        if compiled is None:
            compiled = self._load_or_compile(key, args, kwargs)
        try:
            return compiled(*args, **dyn_kwargs)
        except Exception:
            # aval mismatch / stale executable: fall back loudly-safe
            with _LOCK:
                _MEM.pop(key, None)
            return self._jitted(*args, **kwargs)

    def _load_or_compile(self, key, args, kwargs):
        from jax.experimental import serialize_executable as se

        digest = hashlib.sha256(
            (_pkg_salt() + repr(key)).encode()
        ).hexdigest()[:32]
        path = os.path.join(_cache_dir(), digest + ".aotx")
        compiled = None
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    payload = pickle.load(f)
                compiled = se.deserialize_and_load(*payload)
            except Exception:
                compiled = None
        if compiled is None:
            compiled = self._jitted.lower(*args, **kwargs).compile()
            try:
                payload = se.serialize(compiled)
                tmp = path + f".tmp{os.getpid()}"
                with open(tmp, "wb") as f:
                    pickle.dump(payload, f)
                os.replace(tmp, path)
            except Exception:
                pass
        with _LOCK:
            _MEM[key] = compiled
        return compiled

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
