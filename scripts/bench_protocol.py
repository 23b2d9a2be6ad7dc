"""Bulletproof device timing through the axon TPU tunnel.

Usage: `from scripts.bench_protocol import timed_diff` in ad-hoc
experiments; bench.py itself uses the donated-state + value-fetch form of
the same protocol.

Pitfalls this defeats (all observed on this transport):
  * execution memoization on identical (executable, inputs)
  * block_until_ready returning without waiting for device completion
  * XLA slicing scalar-dependent chains down to one output element
Protocol: n-iteration scan chains with FULL-tensor feedback, perturbed
fresh inputs per timed call, a value fetch (jnp.sum -> float) to force
completion, and (n2-n1) differencing to cancel every fixed overhead
(RPC, fetch, sum execution)."""
import os
import time
import jax
import jax.numpy as jnp

# Every experiment importing this helper shares bench.py's persistent
# compilation cache: fresh-process chain compiles through the axon tunnel
# run minutes each, and re-sweeps repay them all without this. Opt-out
# (e.g. read-only checkout, or an importer managing its own cache config)
# via DPCR_NO_BENCH_CACHE=1; failures to create the dir degrade to no
# cache instead of breaking import.
if not os.environ.get("DPCR_NO_BENCH_CACHE"):
    _CACHE = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        os.makedirs(_CACHE, exist_ok=True)
    except OSError:
        pass
    else:
        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update("jax_compilation_cache_dir", _CACHE)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)


def _force(r):
    leaf = jax.tree.leaves(r)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def _perturb(args, eps):
    first = jax.tree.map(lambda a: (a * (1.0 + eps)).astype(a.dtype), args[0])
    return (first,) + tuple(args[1:])


def timed_diff(make_chain, args, n1=2, n2=10):
    """ms per iteration of make_chain(n)'s body."""
    f1, f2 = jax.jit(make_chain(n1)), jax.jit(make_chain(n2))
    _force(f1(*args))
    _force(f2(*args))
    a1 = _perturb(args, 1e-6)
    _force(a1[0])
    t0 = time.perf_counter()
    _force(f1(*a1))
    t1 = time.perf_counter()
    a2 = _perturb(args, 2e-6)
    _force(a2[0])
    t2 = time.perf_counter()
    _force(f2(*a2))
    t3 = time.perf_counter()
    return ((t3 - t2) - (t1 - t0)) / (n2 - n1) * 1e3
