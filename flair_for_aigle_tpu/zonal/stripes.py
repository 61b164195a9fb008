"""Streamed canvas D2H: two-ended row frontier + tiered stripe codec.

The on-device uint8 canvases are fetched as horizontal stripes WHILE the
device is still computing, instead of one monolithic D2H after the last
batch (the shared-tunnel D2H runs at ~10-20 MB/s, so a tail fetch costs
seconds of dead time). Two cooperating pieces:

* :class:`StripeStream` — tracks which output rows are FINAL (no remaining
  tile can write them; last-write-wins preserved) via a two-ended frontier,
  and encodes newly-final rows in fixed-height quanta so every streamed
  stripe shares ONE jit executable.
* :class:`StripeCodec` — encodes each stripe on device (RLE / 5-bit pack /
  raw) and ships only the winner across the link, with a probe-then-commit
  scheduler so tier decisions never block the stream.

The reference writes every tile from the host with rasterio windowed writes
(/root/reference/flair_zonal_detection/inference.py:297-352) and has no
counterpart to any of this; it exists because the TPU sits behind a
tunneled link where D2H bytes are the scarce resource.
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

#: phase timings of the last inference_and_write call (seconds) — the bench
#: publishes these so a tunnel-floored result is attributable
LAST_TIMINGS: Dict[str, float] = {}


def future_frontiers(order: np.ndarray, tile_tops: np.ndarray,
                     tile_bots: np.ndarray, img_h: int):
    """future_min_top[c], future_max_bottom[c]: bounds of the output rows
    any tile at processing position >= c can still write."""
    n = len(order)
    fmt = np.empty(n + 1, np.int64)
    fmb = np.empty(n + 1, np.int64)
    fmt[n] = img_h
    fmb[n] = 0
    for i in range(n - 1, -1, -1):
        fmt[i] = min(tile_tops[order[i]], fmt[i + 1])
        fmb[i] = max(tile_bots[order[i]], fmb[i + 1])
    return fmt, fmb


class StripeStream:
    """Encodes newly-final canvas rows as they fall outside the frontier.

    The frontier is two-ended because the two zonal paths process tiles in
    different orders: the host path keeps the reference's column-major
    generation order (only the top frontier ever moves, late), while the
    resident path re-orders bottom-up row-major so the bottom frontier
    sweeps the whole canvas during the run.

    Encodes advance in fixed ``quantum``-row quanta: stripe heights are jit
    shapes for the pack/RLE executables, and frontier advances depend on
    poll timing — unquantized heights meant a nondeterministic zoo of
    one-off compiles. With the quantum, every streamed stripe shares ONE
    executable; the sub-quantum remainder lands at finalize.
    """

    def __init__(self, tasks, img_h: int, codec: "StripeCodec",
                 quantum: int = 512):
        self.tasks = list(tasks)
        self.codec = codec
        self.quantum = quantum
        self.fetched_top = 0        # rows [0, fetched_top) encoded
        self.fetched_bot = img_h    # rows [fetched_bot, H) encoded
        self.stripes: Dict[str, list] = {t: [] for t in self.tasks}

    def advance(self, canvases: Dict[str, jax.Array], hi: int,
                lo: int) -> None:
        """Encode any newly-final rows: [0, hi) from the top frontier and
        [lo, H) from the bottom one (clamped so the ends never cross)."""
        q = self.quantum
        hi = min(int(hi), self.fetched_bot) // q * q
        while hi - self.fetched_top >= q:
            for t in self.tasks:
                self.stripes[t].append(self.codec.encode(
                    canvases[t], t, self.fetched_top, self.fetched_top + q))
            self.fetched_top += q
        lo = max(int(lo), self.fetched_top)
        lo = self.fetched_bot - (self.fetched_bot - lo) // q * q
        while self.fetched_bot - lo >= q:
            for t in self.tasks:
                self.stripes[t].append(self.codec.encode(
                    canvases[t], t, self.fetched_bot - q, self.fetched_bot))
            self.fetched_bot -= q


class StripeCodec:
    """Tiered stripe D2H encoder/decoder for the on-device canvases.

    Tiers per stripe (all encodings computed on device; only the chosen
    one crosses the link at full size):

    * ``rle-small`` — fixed-capacity RLE at 1 run / 256 px (~32x fewer
      bytes than 5-bit packing); the buffer and run count ship async the
      moment the stripe's rows are final, fully overlapped with compute.
    * ``rle-mid`` — 1 run / 32 px capacity (~4x cut), fetched on demand
      at finalize when the true run count overflows the small tier.
    * ``pack5`` — 5-bit packed (1.6x cut), the incompressible fallback.
    * ``raw`` — dense bytes (``pack_d2h: false`` or class_prob canvases).

    RLE is lossless (run-split of the flattened row-major map); outputs
    are bit-identical across tiers — see test_zonal pack/rle parity.

    Probe-then-commit scheduling: the first stripes (<= MAX_PROBES) run
    BOTH encodings and dual-ship — the packed bytes stream immediately
    (so an incompressible map never waits on a verdict) while the RLE
    run count crosses asynchronously. Tier decisions resolve
    opportunistically during the stream (``poll`` checks the prefetched
    run counts' ``is_ready`` without blocking); the first verdict commits
    the whole run to ``rle`` (compressible: later stripes ship ~50 KB
    each and skip the packed transfer) or ``pack5`` (noise-like maps,
    e.g. argmax of random weights: the classic fully-overlapped path,
    also chosen when no probe resolves in time). Stragglers are resolved
    at finalize with ONE batched fetch (``plan_all`` — a per-stripe sync
    pays a full tunnel RTT). Dual-ship waste is bounded at MAX_PROBES
    packed stripes on compressible maps and ~150 KB of RLE buffers on
    incompressible ones.
    """

    MAX_PROBES = 3

    def __init__(self, pack: bool, use_rle: bool, img_w: Dict[str, int]):
        self.pack = pack
        self.img_w = img_w
        self._pending: list = []  # encoded, tier not yet resolved
        # probe -> rle | pack5: the run's compressibility is measured on
        # its first stripes and the whole run commits to one codec
        self.mode = "probe" if (pack and use_rle) else ("pack5" if pack
                                                        else "raw")
        self._probes = 0
        if pack:
            from flair_for_aigle_tpu.ops.pack import pack_labels5

            self._pack_jit = jax.jit(pack_labels5)
            self.w8 = {t: -(-w // 8) * 8 for t, w in img_w.items()}
        if use_rle:
            from flair_for_aigle_tpu.ops.rle import rle_encode5

            self._rle_jit = jax.jit(rle_encode5, static_argnums=1)

    def encode(self, canvas, t: str, a: int, b: int) -> dict:
        """Encode canvas rows [a, b) and start their async D2H."""
        rec = {"y0": a, "h": b - a}
        if self.mode == "raw":
            raw = canvas[:, a:b, : self.img_w[t]]
            raw.copy_to_host_async()
            rec["raw"] = raw
            return rec
        packed = self._pack_jit(canvas[:, a:b, : self.w8[t]])
        rec["packed"] = packed
        mode = self.mode
        if mode == "probe" and self._probes >= self.MAX_PROBES:
            # probes unresolved (slow link round-trip) — stop betting: the
            # probes dual-shipped their packed bytes, so committing to
            # pack5 keeps every stripe's transfer overlapped either way
            mode = self.mode = "pack5"
        if mode in ("probe", "rle"):
            sl = canvas[:, a:b, : self.img_w[t]]
            npx = sl.size
            small = max(64, npx // 256)
            mid = max(small * 2, npx // 32)
            if mid * 5 < packed.nbytes:
                runs_mid, n_runs = self._rle_jit(sl, mid)
                runs_small = runs_mid[:small]
                runs_small.copy_to_host_async()
                n_runs.copy_to_host_async()
                rec.update(small=runs_small, mid=runs_mid, n_runs=n_runs)
                if mode == "probe":
                    # dual-ship: the packed fallback streams NOW so an
                    # incompressible map never waits on the probe verdict
                    packed.copy_to_host_async()
                    rec["packed_sent"] = True
                    self._probes += 1
                    LAST_TIMINGS["rle_probes"] = self._probes
                self._pending.append(rec)
                self.poll()
                return rec
        packed.copy_to_host_async()
        return rec

    def _decide(self, rec: dict, nr: int) -> None:
        """Tier decision from the fetched run count; launches the chosen
        tier's D2H and commits the run's codec mode on the first verdict."""
        rec["nr"] = nr
        if nr <= rec["small"].shape[0]:
            rec["tier"] = "small"
            compressible = True
        elif nr <= rec["mid"].shape[0]:
            rec["tier"] = "mid"
            rec["mid"].copy_to_host_async()
            compressible = True
        else:
            rec["tier"] = "packed"
            if not rec.get("packed_sent"):
                rec["packed"].copy_to_host_async()
            compressible = False
        if self.mode == "probe":
            self.mode = "rle" if compressible else "pack5"
            LAST_TIMINGS["d2h_codec_mode"] = self.mode

    def poll(self) -> None:
        """Opportunistic tier resolution during the stream: resolve any
        stripe whose prefetched run count has landed (no blocking), so its
        chosen transfer starts while compute continues."""
        still = []
        for rec in self._pending:
            try:
                ready = rec["n_runs"].is_ready()
            except AttributeError:  # older jax / non-array
                ready = False
            if ready:
                self._decide(rec, int(np.asarray(rec["n_runs"])))
            else:
                still.append(rec)
        self._pending = still

    def plan_all(self, recs: list) -> None:
        """Phase A: pick every stripe's tier with ONE host round-trip
        (the per-stripe run counts are stacked on device and fetched as a
        single array — per-stripe ``np.asarray`` syncs each pay a full
        tunnel RTT and serialized to seconds), then start every on-demand
        fetch so all transfers are in flight before phase B blocks on the
        first one."""
        pend = [r for r in recs if "n_runs" in r and "tier" not in r]
        LAST_TIMINGS["plan_pending"] = len(pend)
        if not pend:
            return
        counts = np.asarray(jnp.stack([r["n_runs"] for r in pend]))
        for rec, nr in zip(pend, counts):
            self._decide(rec, int(nr))
        self._pending = [r for r in self._pending if "tier" not in r]

    def decode_into(self, rec: dict, dst) -> tuple[int, float]:
        """Phase B: land the stripe into the canvas view; returns
        (bytes fetched, seconds blocked on D2H)."""
        tier = rec.get("tier")
        if tier in ("small", "mid"):
            from flair_for_aigle_tpu.ops.rle import rle_decode_into

            t0 = time.perf_counter()
            runs = np.asarray(rec[tier])
            dt = time.perf_counter() - t0
            rle_decode_into(runs, rec["nr"], dst)
            # a probe stripe dual-shipped its packed fallback too
            extra = rec["packed"].nbytes if rec.get("packed_sent") else 0
            return runs.nbytes + 4 + extra, dt
        if "packed" in rec:
            from flair_for_aigle_tpu.ops.pack import unpack_labels5_into

            t0 = time.perf_counter()
            arr = np.asarray(rec["packed"])
            dt = time.perf_counter() - t0
            # native in-place unpack straight into the canvas slice —
            # overlaps the remaining stripes' in-flight D2H
            unpack_labels5_into(arr, dst)
            extra = rec["small"].nbytes + 4 if "small" in rec else 0
            return arr.nbytes + extra, dt
        t0 = time.perf_counter()
        arr = np.asarray(rec["raw"])
        dt = time.perf_counter() - t0
        dst[...] = arr
        return arr.nbytes, dt


def finalize_canvases(canvases, stream: StripeStream, img_h,
                      output_files) -> None:
    """Fetch any canvas rows not yet streamed and land every stripe."""
    codec, stripes = stream.codec, stream.stripes
    t_wait = t_unpack = t_write = 0.0
    d2h_bytes = 0
    for t in stream.tasks:
        if stream.fetched_top < min(stream.fetched_bot, img_h[t]):
            stripes[t].append(
                codec.encode(canvases[t], t, stream.fetched_top,
                             min(stream.fetched_bot, img_h[t]))
            )
    t0 = time.perf_counter()
    codec.plan_all([rec for t in stream.tasks for rec in stripes[t]])
    t_plan = time.perf_counter() - t0
    for t in stream.tasks:
        w = output_files[t]
        for rec in stripes[t]:
            y0, rows = rec["y0"], rec["h"]
            t0 = time.perf_counter()
            nbytes, dt = codec.decode_into(rec, w.canvas[:, y0:y0 + rows, :])
            d2h_bytes += nbytes
            t_wait += dt
            t_unpack += time.perf_counter() - t0 - dt
        t0 = time.perf_counter()
        w.close()
        t_write += time.perf_counter() - t0
    LAST_TIMINGS.update(
        finalize_plan_s=round(t_plan, 3),
        finalize_wait_s=round(t_wait, 3), finalize_unpack_s=round(t_unpack, 3),
        finalize_tiff_write_s=round(t_write, 3), d2h_bytes=d2h_bytes,
    )
