"""Batched alignment engine: bucketing, dispatch, result assembly.

TPU-native replacement for the reference's host-side scheduling stack:

* OpenMP thread pool + 2 CUDA streams per thread + `is_free` polling
  (test_prog.cpp:195-214, 273-374)  ->  JAX async dispatch: every
  bucket is launched without blocking and results are gathered at the
  end, so host packing of bucket N+1 overlaps device compute of N.
* Uneven bucketing + subwarp rejoining (agatha_kernel.h:113, 365-408)
  ->  host-side length bucketing: pairs are sorted by cost and grouped
  into shape-uniform buckets, so every program in a bucket carries
  near-equal work and the SIMT-divergence problem the reference's two
  mechanisms fight never arises.
* The mid-launch device->host sort round-trip (gasal_align.cu:14-18)
  ->  eliminated: sorting happens on host before dispatch.

Bucket shapes are rounded to a coarse geometric grid so the number of
distinct compiled kernels stays small across arbitrary datasets.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from agatha_tpu.config import AlignConfig, EngineConfig
from agatha_tpu.io.fasta import SeqPair
from agatha_tpu.ops.kernel import (
    B_PAIRS,
    LANE,
    align_bucket,
    b_pairs_for_width,
    pack_nibbles,
    window_width,
)
from agatha_tpu.ops.packing import encode_padded


def _round_shape(x: int) -> int:
    """Round up to 128 * {1, 2, 3, 4, 6, 8, 12, ...} (geometric grid).

    Bounds padding waste at 50% worst-case while keeping the set of
    compiled kernel shapes logarithmic in the length range.  All values
    are multiples of 128 (the kernel's lane-tile requirement).
    """
    if x <= LANE:
        return LANE
    if x <= 2 * LANE:
        return 2 * LANE
    p = 2 * LANE
    while True:
        if x <= p:
            return p
        if x <= p + p // 2:
            return p + p // 2
        p *= 2


@dataclasses.dataclass
class AlignmentResult:
    """Per-pair results in input order plus engine statistics."""

    scores: np.ndarray        # int32 (N,)
    query_ends: np.ndarray    # int32 (N,)
    target_ends: np.ndarray   # int32 (N,)
    diags: np.ndarray         # int32 (N,) antidiagonals swept per pair
    n_buckets: int = 0
    kernel_ms: float = 0.0    # wall-clock of the dispatch+gather window
    cigars: list[str] | None = None  # when traceback was requested
    bucket_ms: list[float] | None = None  # per-bucket completion deltas
    routes: list[str] | None = None  # per-bucket kernel that served it
                                     # (anti/anti-sharded/colsweep/
                                     # colband/walk)


@dataclasses.dataclass
class _Bucket:
    indices: np.ndarray       # original pair indices (n,)
    meta: np.ndarray
    tcodes: np.ndarray
    qfwd: np.ndarray


class AlignEngine:
    """Aligns arbitrary batches of encoded pairs on the local device(s).

    Reuses compiled kernels across calls (keyed on bucket shape + cfg,
    via jax.jit's cache).
    """

    def __init__(
        self,
        cfg: AlignConfig,
        engine_cfg: EngineConfig | None = None,
        *,
        interpret: bool = False,
    ):
        self.cfg = cfg
        self.engine_cfg = engine_cfg or EngineConfig()
        self.interpret = interpret
        self._mesh = None  # lazy: None = unprobed, False = single-dev

    # -- input preparation ------------------------------------------------
    def encode_pairs(
        self, pairs: list[SeqPair]
    ) -> list[tuple[np.ndarray, np.ndarray, int, int]]:
        """FASTA pairs -> (q_codes, t_codes, qlen, rlen) with ops applied.

        Uses the native C++ batch encoder when available (the host-side
        hot path at scale); falls back to NumPy per pair.
        """
        from agatha_tpu import native

        if native.available() and pairs:
            def batch(seqs, ops):
                stride = max(
                    8, -(-max(len(s) for s in seqs) // 8) * 8
                )
                rows, lens = native.encode_batch(
                    [s.encode() if isinstance(s, str) else s
                     for s in seqs],
                    np.asarray(ops, np.uint8),
                    stride,
                    n_threads=self.engine_cfg.cpu_threads,
                )
                return rows, lens

            q_rows, q_lens = batch(
                [p.query for p in pairs], [p.query_op for p in pairs]
            )
            t_rows, t_lens = batch(
                [p.target for p in pairs], [p.target_op for p in pairs]
            )
            out = []
            for i in range(len(pairs)):
                ql, rl = int(q_lens[i]), int(t_lens[i])
                out.append(
                    (
                        q_rows[i, : -(-ql // 8) * 8],
                        t_rows[i, : -(-rl // 8) * 8],
                        ql,
                        rl,
                    )
                )
            return out

        out = []
        for p in pairs:
            qc = encode_padded(p.query, p.query_op)
            tc = encode_padded(p.target, p.target_op)
            out.append((qc, tc, len(p.query), len(p.target)))
        return out

    # -- bucketing ---------------------------------------------------------
    def make_buckets(
        self, encoded: list[tuple[np.ndarray, np.ndarray, int, int]]
    ) -> list[_Bucket]:
        return list(self.iter_buckets(encoded))

    def iter_buckets(
        self, encoded: list[tuple[np.ndarray, np.ndarray, int, int]],
        lane_kernels_ok: bool = True,
    ):
        """Yield buckets one at a time so dispatch overlaps packing.

        ``lane_kernels_ok=False`` tells the split that no bucket can
        route to a lane-mapped kernel regardless of the gates (the
        device-traceback path walks every bucket through the
        flag-emitting antidiagonal kernel), so the 128-pair snap never
        fires and the tuned target_buckets split is kept.
        """
        n = len(encoded)
        sw = self.cfg.slice_width
        # Adaptive bucket size: ~target_buckets buckets pipeline host
        # packing, upload and compute against each other (measured
        # 1.5x over one big bucket on 10kb reads); aligns_per_batch
        # (-a) is an upper bound on bucket size.
        tb = max(1, self.engine_cfg.target_buckets)
        cap = max(B_PAIRS, self.engine_cfg.aligns_per_batch)
        base = min(cap, -(-n // tb))

        w_need = np.empty(n, np.int64)
        q_need = np.empty(n, np.int64)
        d_need = np.empty(n, np.int64)
        lens = np.empty((n, 2), np.int32)
        for i, (_qc, _tc, ql, rl) in enumerate(encoded):
            lens[i] = (ql, rl)
            pql = -(-ql // 8)
            prl = -(-rl // 8)
            w_need[i] = prl * 8
            q_need[i] = pql * 8
            tad = prl + pql - 1
            i_end = -(-tad // sw) * sw
            d_need[i] = 8 * i_end + 8

        # Sort by sweep length (the kernel's trip count), then width:
        # pairs sharing a program then terminate together.
        order = np.lexsort((w_need, d_need))

        def chunk_pairs(lo: int) -> int:
            """Pairs for the chunk starting at sorted position lo.

            The tuned ~target_buckets split (``base``) used to be
            clamped to a hard 64-pair floor, which at small long-read
            batches collapses the split entirely: the ONT config
            (128 x ~75 kb, 37.5-112.5 kb spread) got 2 buckets whose
            pairs sweep to the bucket max — ~25% dead sweep.  The
            floor's real purpose is per-dispatch amortization, so make
            it work-adaptive: a bucket must carry roughly
            TARGET_BUCKET_NS of estimated device time (the measured
            per-bucket wall of the tuned headline split, 16 x 64 pairs
            x 10 kb ~= 30 ms; per-substep cost ~190 ns, PERF_NOTES
            instruction audit), never more than the old 64 floor.
            d_need[order[lo]] is the chunk's SHORTEST pair (ascending
            sort), so the estimate errs toward larger buckets.
            """
            SUBSTEP_NS = 190
            TARGET_BUCKET_NS = 30e6
            pair_ns = max(1, int(d_need[order[lo]]) * SUBSTEP_NS // 8)
            work_floor = -(-int(TARGET_BUCKET_NS // pair_ns) //
                           B_PAIRS) * B_PAIRS
            floor = max(B_PAIRS, min(64, work_floor))
            return min(cap, max(floor, base))

        # Lane-mapped kernels (colsweep/colband: pairs on the 128
        # lanes) pad every program to a 128-pair block, so a chunk
        # that will route there snaps UP to a 128-pair multiple
        # (still under the -a cap) — the adaptive target-bucket
        # split would otherwise pad e.g. 16 x 64-pair buckets to 50%
        # lane waste.  Decided PER CHUNK, mirroring the per-bucket
        # routing predicates on the chunk's own lengths: a chunk the
        # lane-mapped gates reject (e.g. long reads with colband off)
        # keeps the tuned target_buckets split.  Sorting makes
        # eligibility effectively a prefix property (the gates are
        # monotone in pair length), so mixed batches snap their
        # short-read prefix only.
        lane_kernels = lane_kernels_ok and (
            self.engine_cfg.colsweep or self.engine_cfg.colband
        )

        lo = 0
        while lo < n:
            take = chunk_pairs(lo)
            snap = min(cap, -(-take // LANE) * LANE)
            if (snap > take and lane_kernels
                    and self._chunk_lane_mapped(
                        lens[order[lo : lo + snap]])):
                take = snap
            idx = order[lo : lo + take]
            lo += take
            w = _round_shape(int(w_need[idx].max()))
            # program height depends on bucket width (narrow buckets
            # pack more pairs per program to amortize fixed costs)
            bp = b_pairs_for_width(w, w > window_width(self.cfg))
            gb = -(-len(idx) // bp) * bp
            # >= 3 blocks: kernel stages query feeds in 384-lane windows
            qf = max(3 * LANE, _round_shape(int(q_need[idx].max())))
            meta = np.ones((gb, 2), np.int32)
            tcodes = np.zeros((gb, w), np.int8)
            qfwd = np.zeros((gb, qf), np.int8)
            for row, i in enumerate(idx):
                qc, tc, ql, rl = encoded[i]
                meta[row] = (ql, rl)
                tcodes[row, : len(tc)] = tc
                qfwd[row, : len(qc)] = qc
            yield _Bucket(
                idx, meta, pack_nibbles(tcodes), pack_nibbles(qfwd)
            )

    # -- dispatch ----------------------------------------------------------
    def align(
        self,
        encoded: list[tuple[np.ndarray, np.ndarray, int, int]],
        *,
        traceback: bool = False,
        per_bucket_times: bool = False,
    ) -> AlignmentResult:
        """Align all pairs; optionally compute CIGARs (new capability —
        the reference outputs score + end positions only,
        agatha_kernel.h:359-363).

        ``per_bucket_times`` records one completion delta per bucket
        (the analogue of the reference's one cudaEvent line per batch,
        gasal_align.cu:219-236) at the cost of one tiny device fetch
        per bucket; leave it off on latency-sensitive paths.

        ``kernel_ms`` covers the whole dispatch+gather window — host
        bucket packing and upload included — unlike the reference's
        device-event-only number.
        """
        import time

        n = len(encoded)
        if n == 0:
            z = np.zeros(0, np.int32)
            return AlignmentResult(z, z, z, z, cigars=[] if traceback
                                   else None)
        self._validate(encoded)
        t0 = time.perf_counter()
        buckets, pending, routes = self._dispatch(
            encoded, traceback=traceback
        )
        return self._collect(
            encoded, buckets, pending, t0, routes=routes,
            traceback=traceback, per_bucket_times=per_bucket_times,
        )

    def _validate(self, encoded) -> None:
        over_range: list[int] = []
        for i, (_qc, _tc, ql, rl) in enumerate(encoded):
            if ql < 1 or rl < 1:
                raise ValueError(
                    f"pair {i}: empty sequence (qlen={ql}, rlen={rl}); "
                    "the aligner requires at least one base per side"
                )
            # 16-bit packing limits, identical to the reference
            # (BASELINE.md: scores < 2^15 from the (H<<16)|r max
            # packing, ref end positions < 2^16 from the r extraction;
            # gasal.h:147, agatha_kernel.h:29-30).  Results degrade the
            # same way the reference's would — warn, don't refuse.
            if rl > 0xFFFF or self.cfg.match * min(ql, rl) >= 0x8000:
                over_range.append(i)
        if over_range:
            # One aggregated warning per call: a per-pair message would
            # defeat the warnings-registry dedupe and flood stderr on
            # large long-read batches.
            import warnings

            head = ", ".join(map(str, over_range[:5]))
            more = (
                f" (+{len(over_range) - 5} more)"
                if len(over_range) > 5 else ""
            )
            warnings.warn(
                f"{len(over_range)} pair(s) [{head}{more}] exceed the "
                "16-bit score/position packing range shared with the "
                "reference: end positions alias mod 65536 and scores "
                ">= 32768 corrupt the max tracking",
                RuntimeWarning,
                stacklevel=2,
            )

    def _dispatch(self, encoded, traceback: bool = False):
        """Pack into buckets and launch every kernel asynchronously.

        Buckets dispatch as soon as each is packed, so host packing and
        uploads overlap device compute (the JAX analogue of the
        reference's fill-next-batch-while-previous-runs streams,
        test_prog.cpp:273-374).

        With device traceback each bucket's emit-flags kernel is
        immediately followed by its on-device walk, so CIGAR extraction
        overlaps the next bucket's scoring on the chip and the flag
        bitmap (whose only reference dies inside
        align_bucket_traceback) is freed bucket by bucket — peak flag
        HBM stays ~one bucket regardless of batch size.
        """
        device_tb = (
            traceback and self.engine_cfg.traceback_mode == "device"
        )
        mesh = None if device_tb else self._local_mesh()
        tb_devs = None
        cs_devs = None
        buckets = []
        pending = []
        routes = []

        def rr_device():
            """Next device in the bucket round-robin (lane-mapped
            kernels place whole buckets: the diagonal ring + chain are
            device-local, so bucket-granular parallelism beats sharding
            rows)."""
            nonlocal cs_devs
            if cs_devs is None:
                import jax

                cs_devs = (
                    jax.local_devices()
                    if self.engine_cfg.use_all_devices else [None]
                )
                if len(cs_devs) <= 1:
                    cs_devs = [None]
            return cs_devs[len(pending) % len(cs_devs)]

        for b in self.iter_buckets(encoded,
                                   lane_kernels_ok=not device_tb):
            if not device_tb and self._colsweep_ok(b):
                # short-read regime: the column-sweep kernel (pairs on
                # lanes) is exact here and ~5x the antidiagonal mapping
                # (PERF_NOTES round 3)
                from agatha_tpu.ops.colsweep import align_bucket_colsweep

                buckets.append(b)
                routes.append("colsweep")
                pending.append(
                    align_bucket_colsweep(
                        b.meta, b.tcodes, b.qfwd, self.cfg,
                        interpret=self.interpret, device=rr_device(),
                    )
                )
            elif not device_tb and self._colband_ok(b):
                # long-read banded regime: the banded column-sweep
                # kernel (sliding row window, pairs on lanes).
                # Opt-in only (EngineConfig.colband, default False):
                # a wash with the antidiagonal mapping end-to-end at
                # the 10 kb headline once its dispatch plumbing was
                # fixed (492 vs 474 ms — PERF_NOTES round 5 "3.7x
                # gap, decomposed"), retained as an experimental
                # mapping.
                from agatha_tpu.ops.colband import align_bucket_colband

                buckets.append(b)
                routes.append("colband")
                pending.append(
                    align_bucket_colband(
                        b.meta, b.tcodes, b.qfwd, self.cfg,
                        interpret=self.interpret, device=rr_device(),
                    )
                )
            elif device_tb:
                from agatha_tpu.ops.walk import align_bucket_traceback

                if tb_devs is None:
                    import jax

                    tb_devs = (
                        jax.local_devices()
                        if self.engine_cfg.use_all_devices else [None]
                    )
                    if len(tb_devs) <= 1:
                        tb_devs = [None]
                for sb in self._split_for_flags(
                        b, n_parts=len(tb_devs)):
                    # round-robin across local chips: each device runs
                    # its own flag-kernel + walk pipeline concurrently
                    dev = tb_devs[len(pending) % len(tb_devs)]
                    buckets.append(sb)
                    routes.append("walk")
                    pending.append(
                        align_bucket_traceback(
                            sb.meta, sb.tcodes, sb.qfwd, self.cfg,
                            interpret=self.interpret, device=dev,
                        )
                    )
            elif mesh is not None:
                from agatha_tpu.parallel.sharding import (
                    align_bucket_sharded,
                    pad_rows,
                )

                unit = mesh.devices.size * B_PAIRS
                gb = -(-b.meta.shape[0] // unit) * unit
                buckets.append(b)
                routes.append("anti-sharded")
                pending.append(
                    align_bucket_sharded(
                        pad_rows(b.meta, gb, 1),
                        pad_rows(b.tcodes, gb),
                        pad_rows(b.qfwd, gb),
                        self.cfg, mesh, interpret=self.interpret,
                    )
                )
            else:
                buckets.append(b)
                routes.append("anti")
                pending.append(
                    align_bucket(
                        b.meta, b.tcodes, b.qfwd, self.cfg,
                        interpret=self.interpret,
                    )
                )
        return buckets, pending, routes

    def _chunk_lane_mapped(self, lens: np.ndarray) -> bool:
        """Predict whether a chunk would route to a lane-mapped kernel.

        ``lens`` is the chunk's (k, 2) [qlen, rlen] array.  Mirrors
        `_colsweep_ok` / `_colband_ok` before the bucket arrays exist,
        using the same padded widths the bucket builder will produce,
        so the 128-pair snap only fires on chunks that will actually
        pad to 128-lane programs.
        """
        from agatha_tpu.ops.kernel import int16_safe

        meta = np.ascontiguousarray(lens, np.int32)
        if self.engine_cfg.colsweep:
            from agatha_tpu.ops.colsweep import colsweep_eligible

            w = _round_shape(int((8 * (-(-meta[:, 1] // 8))).max()))
            qf = max(
                3 * LANE,
                _round_shape(int((8 * (-(-meta[:, 0] // 8))).max())),
            )
            if colsweep_eligible(
                    meta, self.cfg,
                    int16_safe(self.cfg, max_len=w + qf)):
                return True
        if self.engine_cfg.colband:
            from agatha_tpu.ops.colband import colband_eligible

            score_len = int(np.minimum(meta[:, 0], meta[:, 1]).max())
            if colband_eligible(
                    meta, self.cfg,
                    int16_safe(self.cfg, max_len=score_len)):
                return True
        return False

    def _colsweep_ok(self, b: _Bucket) -> bool:
        """True when the column-sweep kernel is exact for this bucket.

        Requires `EngineConfig.colsweep`, the int16-safe regime for the
        bucket's wire shapes, and a band that covers every packed
        diagonal of the largest pair (colsweep_eligible) — at the
        canonical band 751 this admits the reference's 150 bp regime
        (test_prog/Makefile:45-61).  Device traceback keeps the
        antidiagonal kernel (the flag-emitting variant lives there).
        """
        if not self.engine_cfg.colsweep:
            return False
        from agatha_tpu.ops.colsweep import colsweep_eligible
        from agatha_tpu.ops.kernel import int16_safe

        wire = 2 if b.tcodes.dtype == np.uint8 else 1
        w = b.tcodes.shape[1] * wire
        qf = b.qfwd.shape[1] * wire
        return colsweep_eligible(
            b.meta, self.cfg, int16_safe(self.cfg, max_len=w + qf)
        )

    def _colband_ok(self, b: _Bucket) -> bool:
        """True when the banded column-sweep kernel serves this bucket.

        Requires `EngineConfig.colband` plus the int16-safe regime and
        VMEM envelope (colband_eligible) — the band geometry itself
        needs no check: the slice/chunk/band clipping is implemented.
        Checked after `_colsweep_ok` (the full column sweep is faster
        where its band-coverage condition holds); device traceback
        keeps the antidiagonal kernel (the flag-emitting variant).
        """
        if not self.engine_cfg.colband:
            return False
        from agatha_tpu.ops.colband import colband_eligible
        from agatha_tpu.ops.kernel import int16_safe

        # The positive int16 bound is over achievable scores: any
        # cell's H is at most match * min(qlen, rlen) (a prefix
        # alignment consumes at most that many matches) — the same
        # bound _validate enforces for the (H<<16)|r packing.  The
        # wire-width sum colsweep uses would reject 10-16 kb buckets
        # that are comfortably in-range at match=1.
        score_len = int(np.minimum(b.meta[:, 0], b.meta[:, 1]).max())
        return colband_eligible(
            b.meta, self.cfg, int16_safe(self.cfg, max_len=score_len)
        )

    def _local_mesh(self):
        """1-D 'pairs' mesh when >1 local device is usable, else None.

        Every bucket's rows are sharded across all local devices
        (SURVEY.md §2.3 inter-device row): pairs are embarrassingly
        parallel, and bucket-level sharding keeps all chips busy even
        when a batch produces fewer buckets than there are devices.
        The device-traceback path multi-devices differently: its flag
        bitmap + walk are per-device local, so _dispatch round-robins
        whole traceback buckets across local chips instead of sharding
        rows (each chip runs an independent flags+walk pipeline).
        """
        if not self.engine_cfg.use_all_devices:
            return None
        if self._mesh is None:
            import jax

            # local devices only: under jax.distributed the global list
            # includes other hosts' devices, which a single process
            # cannot device_put to (cross-host batches go through
            # parallel.distributed instead)
            devs = jax.local_devices()
            if len(devs) <= 1:
                self._mesh = False
            else:
                from agatha_tpu.parallel.sharding import make_pairs_mesh

                self._mesh = make_pairs_mesh(devs)
        return self._mesh or None

    def _split_for_flags(self, b: _Bucket, n_parts: int = 1):
        """Split a bucket so its flag bitmap fits tb_flag_bytes.

        ``n_parts`` > 1 additionally splits into at least that many
        sub-buckets (rows permitting) so the round-robin device
        dispatch keeps every local chip busy even when a batch packs
        into fewer buckets than there are devices.
        """
        from agatha_tpu.ops.kernel import (
            flag_planes_needed,
            window_width,
        )

        w = b.tcodes.shape[1] * (2 if b.tcodes.dtype == np.uint8 else 1)
        planes = flag_planes_needed(b.meta, self.cfg)
        w_state = min(w, window_width(self.cfg))
        per_row = planes * w_state * 4
        max_rows = max(8, (self.engine_cfg.tb_flag_bytes // per_row)
                       // 8 * 8)
        if n_parts > 1:
            per_part = -(-b.meta.shape[0] // n_parts)  # ceil
            part = max(8, -(-per_part // 8) * 8)       # up to 8-mult
            max_rows = min(max_rows, part)
        gb = b.meta.shape[0]
        if gb <= max_rows:
            yield b
            return
        n_idx = len(b.indices)
        for lo in range(0, gb, max_rows):
            hi = min(gb, lo + max_rows)
            idx = b.indices[lo:min(hi, n_idx)]
            if len(idx) == 0:
                break  # all-padding tail
            yield _Bucket(
                idx, b.meta[lo:hi], b.tcodes[lo:hi], b.qfwd[lo:hi]
            )

    def _decode_words(self, w: np.ndarray) -> list[str]:
        """One bucket's packed move words -> CIGAR strings.

        Runs on the collect path's worker thread so the (GIL-free)
        native RLE decode overlaps the next bucket's word fetch and
        the chip's remaining bucket queue.
        """
        from agatha_tpu import native
        from agatha_tpu.ops.walk import decode_moves, moves_to_cigar

        bc = native.moves_to_cigars_batch(
            w, n_threads=self.engine_cfg.cpu_threads
        )
        if bc is None:  # no toolchain: NumPy fallback
            moves = decode_moves(w)
            bc = [moves_to_cigar(moves[k])
                  for k in range(moves.shape[0])]
        return bc

    def _collect(
        self, encoded, buckets, pending, t0, *,
        traceback: bool, per_bucket_times: bool = False,
        routes: list[str] | None = None,
    ) -> AlignmentResult:
        """Fetch dispatched results, reorder, and run traceback.

        Score-only: one device-side concat + a single fetch (per-fetch
        round-trip latency dominates otherwise).  Device traceback:
        per-bucket fetch + pipelined decode — bucket i's word fetch
        returns as soon as ITS walk finishes (the chip is still
        scoring/walking buckets > i, so the per-fetch tunnel
        round-trips hide under device compute) and the native RLE
        decode runs on a worker thread (a GIL-free ctypes call) while
        the main thread blocks on the next fetch.  An all-at-once blob
        fetch here measured ~0.3 s of un-overlapped host tail per
        1024 x 10 kb.
        """
        import time

        import jax.numpy as jnp

        n = len(encoded)
        device_tb = bool(pending) and isinstance(pending[0], tuple)
        tb_futs: list | None = None
        tb_pool = None
        if device_tb:
            from concurrent.futures import ThreadPoolExecutor

            tb_pool = ThreadPoolExecutor(max_workers=1)
            tb_futs = []

        def fetch_one(p):
            if device_tb:
                outs.append(np.asarray(p[0]))
                tb_futs.append(
                    tb_pool.submit(self._decode_words, np.asarray(p[1]))
                )
            else:
                outs.append(np.asarray(p))

        bucket_ms: list[float] | None = None
        if per_bucket_times:
            # Sequential per-bucket fetches in dispatch order: bucket
            # i's fetch returns once its kernel is done, so the deltas
            # approximate per-bucket completion times (compute still
            # overlaps; only the fetches serialize).  block_until_ready
            # is not reliable through the serving tunnel, hence value
            # fetches; result arrays are tiny so fetching them whole
            # replaces the device-side concat.
            bucket_ms = []
            outs = []
            tprev = time.perf_counter()
            for p in pending:
                fetch_one(p)
                tnow = time.perf_counter()
                bucket_ms.append((tnow - tprev) * 1e3)
                tprev = tnow
            all_out = np.concatenate(outs) if len(outs) > 1 else outs[0]
        elif device_tb:
            outs = []
            for p in pending:
                fetch_one(p)
            all_out = np.concatenate(outs) if len(outs) > 1 else outs[0]
        elif len(pending) > 1:
            devs = {
                tuple(sorted(d.id for d in p.devices()))
                for p in pending
            }
            if len(devs) == 1:
                all_out = np.asarray(jnp.concatenate(pending, axis=0))
            else:
                # colsweep round-robin places buckets on different
                # chips: no cross-device concat — overlap the per-
                # bucket host copies instead
                for p in pending:
                    p.copy_to_host_async()
                all_out = np.concatenate(
                    [np.asarray(p) for p in pending]
                )
        else:
            all_out = np.asarray(pending[0])
        scores = np.zeros(n, np.int32)
        qends = np.zeros(n, np.int32)
        tends = np.zeros(n, np.int32)
        diags = np.zeros(n, np.int32)
        # output rows per bucket come from the dispatched arrays, not
        # bucket meta: the sharded path pads rows to the device grid
        row_counts = [
            (p[0] if isinstance(p, tuple) else p).shape[0]
            for p in pending
        ]
        row = 0
        for b, rows in zip(buckets, row_counts):
            out = all_out[row : row + rows]
            row += rows
            idx = b.indices
            k = len(idx)
            scores[idx] = out[:k, 0]
            qends[idx] = out[:k, 1]
            tends[idx] = out[:k, 2]
            diags[idx] = out[:k, 3]
        ms = (time.perf_counter() - t0) * 1e3
        cigars = None
        if traceback and device_tb:
            from agatha_tpu.ops.traceback import never_updated_indices

            cigars = [None] * n
            for b, fut in zip(buckets, tb_futs):
                bc = fut.result()
                for k, idx in enumerate(b.indices):
                    cigars[idx] = bc[k]
            tb_pool.shutdown(wait=False)
            for i in never_updated_indices(
                encoded, scores, qends, tends, self.cfg
            ):
                cigars[i] = ""
        elif traceback:
            from agatha_tpu.ops.traceback import traceback_all

            cigars = traceback_all(
                encoded, qends, tends, scores, self.cfg,
                n_threads=self.engine_cfg.cpu_threads,
            )
        return AlignmentResult(
            scores, qends, tends, diags,
            n_buckets=len(buckets), kernel_ms=ms, cigars=cigars,
            bucket_ms=bucket_ms,
            # threaded through from _dispatch (NOT instance state:
            # align_stream keeps several dispatched chunks in flight,
            # and a shared attribute would attach the last chunk's
            # routes to every earlier chunk's result)
            routes=routes,
        )

    def align_pairs(self, pairs: list[SeqPair]) -> AlignmentResult:
        return self.align(self.encode_pairs(pairs))

    # -- streaming ---------------------------------------------------------
    def align_stream(
        self,
        pairs_iter,
        *,
        traceback: bool = False,
        max_in_flight: int = 3,
    ):
        """Stream alignment over an iterator of SeqPairs (or
        pre-encoded ``(q_codes, t_codes, qlen, rlen)`` tuples).

        The analogue of the reference driver's bounded-batch pipeline
        (test_prog.cpp:245-376: fill batch N+1 while N computes on the
        other CUDA stream): pairs are consumed in chunks of
        ``aligns_per_batch`` (-a), each chunk is encoded + dispatched
        asynchronously, and at most ``max_in_flight`` chunks are alive
        at once — so peak host memory is O(chunk), not O(dataset),
        while encoding of chunk N+1 overlaps device compute of N.

        Yields one AlignmentResult per chunk, in input order.
        """
        import itertools
        import time
        from collections import deque

        chunk_pairs = max(B_PAIRS, self.engine_cfg.aligns_per_batch)
        it = iter(pairs_iter)
        window: deque = deque()

        def drain_one():
            encoded, buckets, pending, t0, routes = window.popleft()
            return self._collect(
                encoded, buckets, pending, t0, routes=routes,
                traceback=traceback,
            )

        while True:
            chunk = list(itertools.islice(it, chunk_pairs))
            if not chunk:
                break
            encoded = (
                chunk if isinstance(chunk[0], tuple)
                else self.encode_pairs(chunk)
            )
            self._validate(encoded)
            t0 = time.perf_counter()
            buckets, pending, routes = self._dispatch(
                encoded, traceback=traceback
            )
            window.append((encoded, buckets, pending, t0, routes))
            if len(window) >= max_in_flight:
                yield drain_one()
        while window:
            yield drain_one()
