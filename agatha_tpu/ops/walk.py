"""On-device CIGAR traceback: flag bitmap + vectorized walk.

Second half of the device traceback pipeline (the first half is the
``emit_flags`` kernel variant in ops/kernel.py).  The reference never
computes CIGARs — its `cigar`/`packed_tb_matrices` fields are allocated
NULL (AGAThA/src/res.cpp:27-28, gasal.h:91-92) — so this subsystem is
TPU-native new capability; the design keeps every heavy byte on the
device:

* The flag bitmap (one 4-bit nibble per DP cell, ~0.5 B/cell) never
  leaves HBM.  Per bucket of 128 x 10 kb pairs that is ~1.3 GB which
  would take >30 s to fetch through a serving tunnel; instead a
  jitted walk consumes it on-device and only the 2-bit/step move
  stream (~5 KB/pair) is fetched.
* The walk is vectorized across pairs: one scan iteration per flag
  plane (= 8 base antidiagonals), with an 8-step inner unroll.  Each
  pair's cursor advances at most one cell per base diagonal (every
  move decrements the cursor's antidiagonal by >= 1), so a
  length-descending sweep visits every path cell exactly once —
  sequential chasing becomes a dense masked sweep, the only shape a
  TPU vector unit runs well.
* Lane extraction is a one-hot multiply-reduce, not a gather: XLA TPU
  gathers lower to slow per-element loops, while (B, W) compare +
  select + row-sum is ~3 vector ops.

Nibble convention (source-side, written by the kernel at cell (r, c)):
  bits 0-1: this cell's H source (0 diag/temp, 1 E, 2 F)
  bit 2:    E(r+1, c) opened from temp(r, c)   (else extended)
  bit 3:    F(r, c+1) opened from temp(r, c)   (else extended)
The walk's E/F states therefore sit on the *source* cell of the gap
edge just consumed; see the state machine in `_walk_jit`.  CIGARs are
identical to the host engine's conventions (ops/traceback.py): M both,
D target-only, I query-only; gaps re-open from the diagonal candidate
`temp`, so an opened gap is followed (path-upstream) by a forced M.

The window frame origin (vbase) is pair-independent, so one (P,)
schedule maps lanes back to rows for a whole bucket — this is what
makes the windowed (long-read) kernel walkable at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from agatha_tpu.config import AlignConfig
from agatha_tpu.ops.kernel import (
    GUARD,
    SHIFT_Q,
    _align_bucket_jit,
    flag_planes_needed,
    int16_safe,
    window_width,
)

_I32 = jnp.int32
_MOVE_CHAR = np.array(["", "M", "D", "I"])


def vbase_schedule(n_planes: int, cfg: AlignConfig, wt: int) -> np.ndarray:
    """Per-plane window origin, mirroring the kernel's next_window.

    One half = INNER_ITERS (8) packed diagonals at a fixed vbase; the
    shift decision is pure in (d8, vbase) (kernel.py next_window), so
    the schedule is reproducible host-side.  Non-windowed buckets
    (wt <= window_width) have vbase == 0 everywhere.
    """
    out = np.zeros(n_planes, np.int32)
    W = window_width(cfg)
    if wt <= W:
        return out
    bw = cfg.band_width
    vb = 0
    for h in range(-(-n_planes // 8)):
        d8 = 64 * h
        want = (
            (((d8 - bw) >> 1) - GUARD) - vb >= SHIFT_Q
            and vb + SHIFT_Q <= wt - W
        )
        if want:
            vb += SHIFT_Q
        out[8 * h : 8 * h + 8] = vb
    return out


@jax.jit
def _walk_jit(flags, vbases, ends):
    """flags (GB, P, W) int32, vbases (P,) int32, ends (GB, 2)
    int32 [q_end, t_end] -> pair-major move words (GB, half) int32.

    Scan row i holds plane p = P-1-i's eight 2-bit moves (bits 2k for
    substep k): 0 none, 1 M, 2 D, 3 I, emitted path-end -> start;
    two 16-bit scan rows pack per int32 (low half first).
    """
    GB, P, W = flags.shape
    lane_iota = jnp.arange(W, dtype=jnp.int32)

    def plane_step(carry, p):
        r, c, st = carry
        plane = jax.lax.dynamic_index_in_dim(
            flags, p, axis=1, keepdims=False
        )  # (GB, W)
        vb = vbases[p]
        word = jnp.zeros((GB,), jnp.int32)
        for k in range(7, -1, -1):
            d = 8 * p + k
            active = (r + c) == d
            inb = active & (r >= 0) & (c >= 0)
            lane = r - vb
            oh = lane_iota[None, :] == lane[:, None]
            fl = jnp.sum(jnp.where(oh, plane, 0), axis=1)
            nib = (fl >> (4 * k)) & 15
            src = nib & 3
            h_st = inb & (st == 0)
            e_st = inb & (st == 1)
            f_st = inb & (st == 2)
            h_e = h_st & (src == 1)
            h_f = h_st & (src == 2)
            e_open = e_st & ((nib & 4) != 0)
            f_open = f_st & ((nib & 8) != 0)
            is_m = (h_st & (src == 0)) | e_open | f_open
            is_d = h_e | (e_st & ~e_open)
            is_i = h_f | (f_st & ~f_open)
            # past the origin row/col: trailing boundary runs
            b_i = active & (r < 0) & (c >= 0)
            b_d = active & (c < 0) & (r >= 0)
            mv = jnp.where(
                is_m, 1,
                jnp.where(is_d | b_d, 2,
                          jnp.where(is_i | b_i, 3, 0)),
            )
            r = r - jnp.where(is_m | is_d | b_d, 1, 0)
            c = c - jnp.where(is_m | is_i | b_i, 1, 0)
            st = jnp.where(
                h_e, 1,
                jnp.where(h_f, 2, jnp.where(is_m, 0, st)),
            )
            word = word | (mv << (2 * k))
        return (r, c, st), word

    init = (
        ends[:, 1].astype(jnp.int32),  # r = t_end
        ends[:, 0].astype(jnp.int32),  # c = q_end
        jnp.zeros((GB,), jnp.int32),   # state H
    )
    ps = jnp.arange(P - 1, -1, -1, dtype=jnp.int32)
    (r, c, _st), words = jax.lax.scan(plane_step, init, ps)
    # One boundary-only step at diagonal -1: a path ending in a leading
    # gap run emits its last I/D with the cursor at (-1, 0) / (0, -1),
    # i.e. r + c == -1, one diagonal below the scan's range.
    at = (r + c) == -1
    extra = jnp.where(
        at & (c < 0) & (r >= 0), 2,
        jnp.where(at & (r < 0) & (c >= 0), 3, 0),
    )
    words = jnp.concatenate([words, extra[None, :]], axis=0)
    # each word uses only bits 0-15 (8 x 2-bit moves); pack two scan
    # rows per int32 before the host fetch (it halves the dominant
    # fetch bytes of the whole traceback path)
    n = words.shape[0]
    if n % 2:
        words = jnp.concatenate(
            [words, jnp.zeros((1, GB), jnp.int32)], axis=0
        )
    return (words[0::2] | (words[1::2] << 16)).T


def _make_walk_kernel(Bw: int, W: int, P: int, NW: int,
                      n_chains: int = 1):
    """Pallas walk: the XLA scan version (_walk_jit) spends ~16 us per
    plane on HBM round-trips between scan iterations; staging each
    (Bw, W) plane in VMEM once and running the 8 extraction substeps in
    registers runs ~6x faster (measured round 3: 480 -> ~80 ms on the
    1024 x 10 kb workload).

    ``n_chains`` splits the Bw rows into independent row groups whose
    substeps interleave in program order — the latency-hiding
    hypothesis behind it was REFUTED on hardware (see the policy note
    in `_walk_pallas_jit`: 2 chains flat, 4+ regress; the substep wall
    is instruction-issue-bound, so multiplying the per-substep
    instruction count by NC cancels the overlap win).  The mechanism
    is kept (bit-identical for every chain count, verified on chip)
    for one-flag re-probing on future Mosaic releases.
    """
    # P is closed over by row_plane below (word row i maps to flag
    # plane P-1-i); the grid/out shapes encode it too
    NC = n_chains
    assert Bw % NC == 0 and (Bw // NC) % 8 == 0, (Bw, NC)
    Bc = Bw // NC

    def kernel(vb_ref, ends_ref, flags_ref, out_ref):
        rowb = pl.multiple_of(pl.program_id(0) * Bw, Bw)
        w128 = jax.lax.broadcasted_iota(_I32, (Bc, 128), 1)

        def plane_dma(buf, p, sem):
            src_lane = jnp.maximum(p, 0) * W  # clamp: pad planes
            return pltpu.make_async_copy(
                flags_ref.at[
                    pl.ds(rowb, Bw),
                    pl.ds(pl.multiple_of(src_lane, 128), W),
                ],
                buf, sem,
            )

        def wtile_dma(wtile, jb, sem):
            return pltpu.make_async_copy(
                wtile,
                out_ref.at[pl.ds(rowb, Bw),
                           pl.ds(pl.multiple_of(jb * 128, 128), 128)],
                sem,
            )

        lane_iota = jax.lax.broadcasted_iota(_I32, (Bc, W), 1)

        def substep_k(plane, p8, k, carry):
            r, c, st, word = carry
            d = p8 + k
            active = (r + c) == d
            inb = active & (r >= 0) & (c >= 0)
            lane = r - vb_ref[jnp.maximum(p8 >> 3, 0)]
            oh = lane_iota == lane
            fl = jnp.sum(jnp.where(oh, plane, 0), axis=1,
                         keepdims=True)
            nib = (fl >> (4 * k)) & 15
            src = nib & 3
            h_st = inb & (st == 0)
            e_st = inb & (st == 1)
            f_st = inb & (st == 2)
            h_e = h_st & (src == 1)
            h_f = h_st & (src == 2)
            e_open = e_st & ((nib & 4) != 0)
            f_open = f_st & ((nib & 8) != 0)
            is_m = (h_st & (src == 0)) | e_open | f_open
            is_d = h_e | (e_st & ~e_open)
            is_i = h_f | (f_st & ~f_open)
            b_i = active & (r < 0) & (c >= 0)
            b_d = active & (c < 0) & (r >= 0)
            mv = jnp.where(
                is_m, 1,
                jnp.where(is_d | b_d, 2,
                          jnp.where(is_i | b_i, 3, 0)),
            )
            r = r - jnp.where(is_m | is_d | b_d, 1, 0)
            c = c - jnp.where(is_m | is_i | b_i, 1, 0)
            st = jnp.where(
                h_e, 1, jnp.where(h_f, 2, jnp.where(is_m, 0, st)),
            )
            word = word | (mv << (2 * k))
            return r, c, st, word

        def substeps(plane_full, p8, carries):
            # k-major over interleaved chains: consecutive bundles are
            # data-independent across chains, hiding the chain latency
            planes = [plane_full[ch * Bc:(ch + 1) * Bc, :]
                      for ch in range(NC)]
            out = list(carries)
            for k in range(7, -1, -1):
                for ch in range(NC):
                    out[ch] = substep_k(planes[ch], p8, k, out[ch])
            return out

        def run(pa, pb, wtile, sems, sem_w):
            def row_plane(i):
                # word row i <-> flag plane P-1-i (path end -> start)
                return (P - 1) - i

            # primer DMAs: planes for rows 0 and 1; out-sem primer
            plane_dma(pa, jnp.int32(row_plane(0)), sems.at[0]).start()
            plane_dma(pb, jnp.int32(row_plane(1)), sems.at[1]).start()
            wtile_dma(wtile, jnp.int32(0), sem_w.at[0]).start()

            def inner(q, carry, jb):
                chains = carry  # NC x (r, c, st)
                i = jb * 256 + 2 * q

                def one(buf, sem, i_row, chains):
                    p = row_plane(i_row)
                    cp = plane_dma(buf, p, sem)
                    cp.wait()
                    plane = buf[:, :]
                    res = substeps(
                        plane, p * 8,
                        [(r, c, st, jnp.zeros((Bc, 1), _I32))
                         for r, c, st in chains],
                    )
                    # prefetch two planes ahead into the same buffer
                    plane_dma(buf, p - 2, sem).start()
                    return (tuple((r, c, st) for r, c, st, _w in res),
                            [w for _r, _c, _s, w in res])

                chains, w_lo = one(pa, sems.at[0], i, chains)
                chains, w_hi = one(pb, sems.at[1], i + 1, chains)
                lane_j = (i >> 1) & 127
                for ch in range(NC):
                    word = w_lo[ch] | (w_hi[ch] << 16)
                    lo = ch * Bc
                    wtile[lo:lo + Bc, :] = wtile[lo:lo + Bc, :] | (
                        jnp.where(w128 == lane_j, word, 0)
                    )
                return chains

            def outer(jb, carry):
                cpw = wtile_dma(wtile, jb, sem_w.at[0])
                cpw.wait()  # previous block's flush (or primer)
                wtile[:, :] = jnp.zeros((Bw, 128), _I32)
                carry = jax.lax.fori_loop(
                    0, 128, lambda q, cy: inner(q, cy, jb), carry
                )
                cpw.start()
                return carry

            ends = ends_ref[:, :]
            init = tuple(
                (
                    ends[ch * Bc:(ch + 1) * Bc, 2:3],  # r = t_end
                    ends[ch * Bc:(ch + 1) * Bc, 1:2],  # c = q_end
                    jnp.zeros((Bc, 1), _I32),          # state H
                )
                for ch in range(NC)
            )
            jax.lax.fori_loop(0, NW // 128, outer, init)
            # drain the dangling prefetches + final block flush
            plane_dma(pa, jnp.int32(0), sems.at[0]).wait()
            plane_dma(pb, jnp.int32(0), sems.at[1]).wait()
            wtile_dma(wtile, jnp.int32(0), sem_w.at[0]).wait()

        pl.run_scoped(
            run,
            pa=pltpu.VMEM((Bw, W), _I32),
            pb=pltpu.VMEM((Bw, W), _I32),
            wtile=pltpu.VMEM((Bw, 128), _I32),
            sems=pltpu.SemaphoreType.DMA((2,)),
            sem_w=pltpu.SemaphoreType.DMA((1,)),
        )

    return kernel


@functools.partial(
    jax.jit, static_argnames=("planes", "w_state", "n_chains"),
)
def _walk_pallas_jit(flags, vbases, ends, *, planes, w_state,
                     n_chains=None):
    """Compiled walk over the flat (GB, planes*W) flag bitmap.

    Returns (GB, NW) pair-major packed words, the SAME convention as
    _walk_jit (padding columns are all-zero, which decoders treat as
    inactive steps)."""
    GB = flags.shape[0]
    # the Bw candidate loop below requires GB % Bw == 0; without this
    # a 12-row bucket would truncate to grid=1 and leave rows 8..11
    # unwalked (uninitialized HBM decoded into garbage CIGARs)
    assert GB % 8 == 0, f"bucket rows must be a multiple of 8, got {GB}"
    # Grid programs run SEQUENTIALLY on the core and the walk's
    # per-substep wall is dominated by fixed per-substep overhead (the
    # ablation probe scripts/walk_probe.py measures the extraction
    # reduce and the move logic each at ~7% — removing either changes
    # nothing), so total wall ~ (GB/Bw) * planes * substep latency:
    # the widest program that fits VMEM minimizes the number of serial
    # substeps (measured isolated: Bw 64 -> 256 on 256 x 10 kb is
    # 50.3 -> 35.3 ms, 1.42x).  VMEM: two (Bw, W) plane buffers + the
    # (Bw, 128) word tile.
    # budget covers the two plane buffers, the word tile, and 2x slack
    # for live (Bw, W) temporaries (one-hot mask, masked product) the
    # compiler may spill; 256 is the widest measured config
    Bw = 8
    vmem_budget = 8 << 20
    for cand in (256, 128, 64, 32, 16, 8):
        need = (4 * cand * w_state + cand * 128) * 4
        if GB % cand == 0 and need <= vmem_budget:
            Bw = cand
            break
    n_rows = planes + 1
    NW = -(-(-(-n_rows // 2)) // 128) * 128
    if n_chains is None:
        # measured policy: 1.  The latency-hiding row split (see
        # _make_walk_kernel) was built and REFUTED on hardware: on
        # 256 x 10 kb real flags (Bw=256), 1/2/4/8 chains = 38.4/38.7/
        # 48.1/77.0 ms (bit-identical) — the interleave win is exactly
        # consumed by the chain-multiplied instruction count at 2 and
        # loses outright beyond, i.e. the substep wall is per-
        # instruction-issue-bound, not dependency-latency-bound.  The
        # mechanism stays for re-probing on future Mosaic releases.
        n_chains = 1
    kernel = _make_walk_kernel(Bw, w_state, planes, NW,
                               n_chains=n_chains)
    words = pl.pallas_call(
        kernel,
        grid=(GB // Bw,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((Bw, 4), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((GB, NW), jnp.int32),
    )(vbases, ends, flags)
    # pair-major (GB, NW) end-to-end: the kernel writes it, the host
    # fetch keeps it, and the native RLE decoder streams each pair's
    # words sequentially — the former (NW, GB) convention forced a
    # device transpose here AND a full host copy
    # (np.ascontiguousarray(words.T)) before every decode
    return words


def align_bucket_traceback(
    meta: np.ndarray,
    tcodes: np.ndarray,
    qfwd: np.ndarray,
    cfg: AlignConfig,
    *,
    interpret: bool = False,
    force_strips: bool = False,
    device=None,
):
    """Align one bucket AND produce its move words, all on device.

    Same input contract as ops.kernel.align_bucket (meta must be a
    host array — plane sizing is static).  Returns ``(out, words)``
    where ``out`` is the usual (GB, 4) result and ``words`` the
    pair-major (GB, NW)
    move words (device array; fetch + decode with `decode_moves`).
    The flag bitmap's only reference dies when this function returns,
    so its HBM is released once the walk has consumed it.  (It is NOT
    donated: the walk's word output is far smaller than the bitmap,
    so XLA can never alias the two and a donate annotation would just
    be silently ignored with a warning.)

    ``device``: optional jax device to pin the whole pipeline to —
    inputs are device_put there and the flag kernel + walk follow,
    which is how the engine round-robins traceback buckets across
    local chips (each device runs its own pipeline concurrently).
    """
    meta = np.asarray(meta)
    w = int(tcodes.shape[1])
    qf = int(qfwd.shape[1])
    # .dtype reads work on numpy AND jax arrays without a transfer
    # (np.asarray here would fetch a pre-staged device array to host
    # just to inspect its dtype)
    if tcodes.dtype == np.uint8:
        w *= 2
    if qfwd.dtype == np.uint8:
        qf *= 2
    safe16 = (not force_strips) and int16_safe(cfg, max_len=w + qf)
    windowed = w > window_width(cfg)
    planes = flag_planes_needed(meta, cfg)

    def stage(x):
        x = jnp.asarray(x)
        return x if device is None else jax.device_put(x, device)

    from agatha_tpu.ops.kernel import n_waves_for_width

    out, flags = _align_bucket_jit(
        stage(np.asarray(meta, np.int32)),
        stage(tcodes),
        stage(qfwd),
        cfg=cfg, w=w, qf=qf, safe16=safe16, interpret=interpret,
        windowed=windowed, emit_flags=True, d8_planes=planes,
        # flag emission is wave-capable: each wave DMAs its own bitmap
        # rows; the interpreter gains nothing from waves (see kernel)
        n_waves=1 if interpret else n_waves_for_width(w, windowed),
    )
    vbases = stage(vbase_schedule(planes, cfg, w))
    w_state = min(w, window_width(cfg)) if windowed else w
    if interpret:
        # XLA walk (also the semantic reference for the Pallas walk)
        flags = flags.reshape(flags.shape[0], planes, -1)
        words = _walk_jit(flags, vbases, out[:, 1:3])
    else:
        words = _walk_pallas_jit(
            flags, vbases, out, planes=planes, w_state=w_state
        )
    return out, words


def decode_moves(words: np.ndarray) -> np.ndarray:
    """Pair-major packed move words (GB, half) -> (GB, n*8) uint8
    moves in path order (alignment end -> start; 0 entries are
    inactive iterations).

    The walk packs two 16-bit scan rows per int32 (low half first).
    """
    words = np.asarray(words).T
    half, GB = words.shape
    w = np.empty((half * 2, GB), np.int32)
    w[0::2] = words & 0xFFFF
    w[1::2] = (words >> 16) & 0xFFFF
    ks = np.arange(7, -1, -1, dtype=np.int32)
    m = (w[:, None, :] >> (2 * ks)[None, :, None]) & 3
    return m.reshape(half * 2 * 8, GB).T.astype(np.uint8)


def moves_to_cigar(moves_row: np.ndarray) -> str:
    """One pair's move stream (end->start, 0 = none) -> CIGAR string."""
    ops = moves_row[moves_row != 0][::-1]
    if ops.size == 0:
        return ""
    change = np.flatnonzero(np.diff(ops))
    starts = np.concatenate(([0], change + 1))
    ends = np.concatenate((change, [ops.size - 1]))
    counts = ends - starts + 1
    chars = _MOVE_CHAR[ops[starts]]
    return "".join(f"{n}{ch}" for n, ch in zip(counts, chars))
