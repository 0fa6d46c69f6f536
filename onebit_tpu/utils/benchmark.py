"""Honest TPU timing utilities.

Three hazards on remote-tunnel TPU runtimes (and lazy runtimes generally):

1. ``block_until_ready`` may return before real device completion — only a
   host fetch of the data forces true synchronization.
2. Loop-invariant op calls can be hoisted/elided; each timed iteration must
   be data-dependent on the previous one.
3. A fixed ~tens-of-ms RPC round trip dominates any single fetch — the
   honest per-op cost is the *marginal* cost between two iteration counts:
   ``(T(hi) - T(lo)) / (hi - lo)``.

``bench_op`` therefore runs the op inside ONE jit via ``lax.scan`` with a
carry data-dependency, times a host fetch, and reports the marginal cost.
"""

from __future__ import annotations

import statistics
import time
from typing import Callable

import jax
import jax.numpy as jnp


def _make_scan(fn: Callable, perturb_arg: int, iters: int):
    # operands enter as jit ARGUMENTS, never closure captures: captured
    # device arrays are baked into the HLO as constants — for GB-scale
    # pools that means shipping the literals through the tunnel compile
    # (measured: a 2.16 GB-constant program wedges the remote compiler;
    # same hazard bench_fn_with_state documents for params)
    def run(*args):
        def body(acc, _):
            a0 = args[perturb_arg]
            # tiny data dependency on the carry: not constant-foldable,
            # value impact below float precision
            perturbed = (a0 + (acc * 1e-30).astype(a0.dtype)).astype(a0.dtype)
            out = fn(*args[:perturb_arg], perturbed,
                     *args[perturb_arg + 1:])
            first = jax.tree.leaves(out)[0]
            return jnp.sum(first.astype(jnp.float32)), None

        return jax.lax.scan(body, jnp.float32(0.0), None, length=iters)[0]

    return jax.jit(run)


def bench_op(fn: Callable, *args, iters_lo: int = 8, iters_hi: int = 64,
             reps: int = 5, perturb_arg: int = 0, iters: int = None) -> float:
    """Median marginal seconds per call of ``fn(*args)``, true device sync."""
    if iters is not None:  # back-compat single-count mode
        iters_lo, iters_hi = 0, iters
    args = list(args)
    run_hi = _make_scan(fn, perturb_arg, iters_hi)
    run_lo = (_make_scan(fn, perturb_arg, iters_lo)
              if iters_lo else None)
    float(run_hi(*args))  # compile + warm
    if run_lo is not None:
        float(run_lo(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run_hi(*args))  # host fetch = true completion barrier
        t_hi = time.perf_counter() - t0
        if run_lo is None:
            ts.append(t_hi / iters_hi)
            continue
        t0 = time.perf_counter()
        float(run_lo(*args))
        t_lo = time.perf_counter() - t0
        ts.append((t_hi - t_lo) / (iters_hi - iters_lo))
    return max(statistics.median(ts), 1e-9)


def bench_fn_with_state(step: Callable, init_state, iters_lo: int = 4,
                        iters_hi: int = 32, reps: int = 3,
                        const=None) -> float:
    """Median *marginal* seconds per call of a carry-style function
    ``state -> state`` (e.g. a decode step), chained inside one jit.

    ``const``: loop-invariant pytree (e.g. model params) passed to ``step``
    as its FIRST argument and to the jitted program as a runtime argument.
    Without it, params captured by closure are baked into the HLO as
    constants — for a 7B model that is ~1.7 GB of embedded constants, a
    30+-minute compile, and a ~661 MB executable (measured); as arguments
    the same program compiles in minutes and the executable is small.

    ``iters_lo=0`` uses a single scan program (cheaper to trace/lower —
    big models cost minutes per program on the host) and accepts the fixed
    ~30 ms fetch overhead amortized over ``iters_hi`` calls (a slight,
    conservative underestimate of throughput).
    """
    if const is None:
        def body(state, _):
            return step(state), None

        def make(n):
            return jax.jit(
                lambda s: jax.lax.scan(body, s, None, length=n)[0])

        def run(fn, state):
            return fn(state)
    else:
        def body_c(c, state, _):
            return step(c, state), None

        def make(n):
            return jax.jit(lambda c, s: jax.lax.scan(
                lambda st, x: body_c(c, st, x), s, None, length=n)[0])

        def run(fn, state):
            return fn(const, state)

    def sync(out):
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))

    run_hi = make(iters_hi)
    run_lo = make(iters_lo) if iters_lo else None
    sync(run(run_hi, init_state))  # compile + warm
    if run_lo is not None:
        sync(run(run_lo, init_state))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(run(run_hi, init_state))
        t_hi = time.perf_counter() - t0
        if run_lo is None:
            # subtract the measured fetch/dispatch floor (sum-op + tunnel
            # RTT on the same state) instead of compiling a second big
            # program: T(hi) = floor + hi * t_step
            t0 = time.perf_counter()
            sync(init_state)
            floor = time.perf_counter() - t0
            ts.append(max(t_hi - floor, 0.0) / iters_hi)
            continue
        t0 = time.perf_counter()
        sync(run(run_lo, init_state))
        t_lo = time.perf_counter() - t0
        ts.append((t_hi - t_lo) / (iters_hi - iters_lo))
    return max(statistics.median(ts), 1e-9)


def bench_step_dispatch(step: Callable, init_state, iters_lo: int = 8,
                        iters_hi: int = 32, reps: int = 3) -> float:
    """Marginal seconds/call via dispatch-chained calls of ONE jitted step.

    Compiles a single program (a scanned loop would re-trace/compile the
    whole model per scan length — minutes for large models).  Each call's
    inputs carry the previous call's outputs, so the final host fetch
    forces every step to really execute.  Includes per-dispatch RPC cost
    (~1-2 ms), making the result slightly conservative.

    ``step`` should already be (or call) a jitted function — wrapping it in
    another jax.jit here would re-lower the whole model into a fresh
    program (minutes on big models), so we call it as-is.
    """
    jstep = step

    def sync(out):
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))

    state = jstep(init_state)
    sync(state)  # compile + warm

    def run(n):
        s = init_state
        t0 = time.perf_counter()
        for _ in range(n):
            s = jstep(s)
        sync(s)
        return time.perf_counter() - t0

    ts = []
    for _ in range(reps):
        t_hi = run(iters_hi)
        t_lo = run(iters_lo)
        ts.append((t_hi - t_lo) / (iters_hi - iters_lo))
    return max(statistics.median(ts), 1e-9)
