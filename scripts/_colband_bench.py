"""Shared staged-protocol harness for colband kernel timing scripts.

Used by colband_kernelrate.py and colband_ablate2.py so the timing
protocol exists in exactly one place: stage the bucket's device
arrays once (uploads out of the loop), build the production
pallas_call for a given module's kernel factory, chain reps inside
ONE jit through an OPAQUE data dependency (the prior output written
into an smeta row the kernel never reads — pallas is opaque to XLA,
so the reps cannot be hoisted; `acc & 0`-style deps get constant-
folded and yield a rep loop that executes ONCE), and report the
ns/col slope between two rep counts (cancels the ~25 ms dispatch +
fetch ends).
"""
import functools
import time

import numpy as np


def stage_bucket(mod, meta, tcodes, qfwd, cfg):
    """Device-stage one bucket for `mod` (a colband module instance).

    Returns (smj, tmat, qmat, shapes).
    """
    import jax.numpy as jnp

    from agatha_tpu.ops.kernel import _unpack_nibbles

    shapes = mod.colband_shapes(meta, cfg)
    RW, R8pad, Qpad = shapes[0], shapes[1], shapes[2]
    sm = mod.chain_scalars(meta, cfg)

    t = _unpack_nibbles(jnp.asarray(tcodes))
    q = _unpack_nibbles(jnp.asarray(qfwd))

    def padt(x, n):
        return jnp.pad(x, ((0, 0), (0, n - x.shape[1]))) \
            if x.shape[1] < n else x[:, :n]

    tmat = jnp.asarray(np.asarray(padt(t, R8pad).T))
    qmat = jnp.asarray(np.asarray(padt(q, Qpad).T))
    return jnp.asarray(sm), tmat, qmat, shapes


def make_call(mod, cfg, shapes, GB):
    """The production pallas_call for `mod`'s kernel at `shapes`."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    RW, R8pad, Qpad, G, gA, gB, tail_steps, LEAD, WMAX = shapes
    LN = mod.LN
    kernel = mod._make_colband_kernel(
        cfg, RW, R8pad, Qpad, G, gA, gB, tail_steps, LEAD, WMAX, False)

    def call(smeta, tm, qm):
        return pl.pallas_call(
            kernel,
            grid=(GB // LN,),
            in_specs=[
                pl.BlockSpec((8, LN), lambda g: (0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec((4, LN), lambda g: (0, g),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((4, GB), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
        )(smeta, tm, qm)

    return call


def rep_chain(call, GB):
    """jit'd n-rep loop serialized through an opaque data dep."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n",))
    def go(smeta, tm, qm, n):
        def body(i, acc):
            # write the prior output into an smeta row the kernel
            # never reads (chain_scalars fills rows 0-4)
            sm2 = smeta.at[7:8, :].set(acc[3:4, :])
            return call(sm2, tm, qm)

        return jax.lax.fori_loop(
            0, n, body, jnp.zeros((4, GB), jnp.int32))

    return go


def slope_ns_per_col(go, smj, tmat, qmat, reps, progs, qpad,
                     rounds=4):
    """(ns_per_col, compile_s): best-of-`rounds` slope between reps
    and reps // 2 (first call compiles)."""
    t0 = time.perf_counter()
    np.asarray(go(smj, tmat, qmat, reps))
    compile_s = time.perf_counter() - t0
    np.asarray(go(smj, tmat, qmat, reps // 2))

    def timeit(n):
        best = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            np.asarray(go(smj, tmat, qmat, n))
            best = min(best, time.perf_counter() - t0)
        return best

    t_full = timeit(reps)
    t_half = timeit(reps // 2)
    dcols = progs * qpad * (reps - reps // 2)
    return (t_full - t_half) / dcols * 1e9, compile_s
