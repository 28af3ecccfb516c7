"""Fully fused video tracking: detect → rows → greedy association in ONE
jitted graph per frame chunk.

`track_video` (fdt/track/iou_tracker.py) mirrors the reference driver
(iouTracke_cal.py:87-178) in three hops per chunk: the detection tensor is
read back to host, `detections_to_rows` converts it, and the rows are
re-uploaded for the device association scan.  Over a slow host↔device link
those two extra round trips (plus the [F, C, top_k, 5] readback) dominate —
the tracker bench historically swung 122–167 fps with identical code purely
on tunnel state.

Here the whole per-chunk pipeline stays on device: the detector's OWN
compiled executable produces the detection tensor, and a second jitted call
fuses an on-device re-expression of `detections_to_rows` (prefix-take at the
score floor, pixel scaling, the My_test.py:61-62 empty-frame sentinel) with
the `_associate_chunk` lax.scan.  Both dispatches are async — the host never
touches the [F, C, top_k, 5] tensor and blocks only on the small assignment
records plus the kept rows, so throughput tracks the detector, not the link
RTT.

Two dispatches instead of one on purpose: reusing the detector's compiled
executable keeps the detection tensor BIT-EQUAL to `detect_tensor` (inlining
the forward into a larger jit lets XLA re-fuse and rounds conf scores by an
ulp — observed, not hypothetical), and async dispatch already removes every
host↔device synchronization between the calls.  Bit-equal tracks vs the
unfused pipeline are pinned in
tests/test_tracker.py::test_fused_video_tracker_matches_host.
"""
from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from fdt.config import TRACKER, TrackerConfig
from fdt.track.device_tracker import DeviceIoUTracker, _associate_chunk


class FusedVideoTracker(DeviceIoUTracker):
    """DeviceIoUTracker that also owns the detector: feed it raw frames.

    Args:
      detector: a fdt.infer.pyramidbox.PyramidBoxDetector (FaceBoxDetector
        shares the detection-tensor contract and works too).
      cfg: tracker thresholds (score_floor is the row-conversion threshold,
        exactly `track_video`'s `detect_threshold`).
      det_cap: static per-frame detection budget entering association.  The
        host path is unbounded; rows are score-sorted by NMS, so a cap keeps
        the TOP det_cap — equal to the host path whenever fewer than det_cap
        rows pass the floor (and to its `rows[:det_cap]` variant always).
        Defaults to the detector's top_k (= truly unbounded parity).
      threshold / nms_thresh: detect-graph conf/NMS thresholds; default to
        the detector's DetectConfig like `detect_tensor` does.
      lookahead: max chunks in flight (default 1 = pipelined).  NOTE the
        behavioral consequence: with lookahead > 0, host-visible tracker
        state (`finished`, `frame_num`, track histories) LAGS the last
        step_frames call by up to `lookahead` chunks, and association errors
        surface one call later — callers that poll state between chunks
        (e.g. a live overlay) should pass lookahead=0 (synchronous) or call
        flush() first.
    """

    def __init__(self, detector, cfg: TrackerConfig = TRACKER,
                 det_cap: int | None = None, threshold: float | None = None,
                 nms_thresh: float | None = None, t_max: int = 256,
                 lookahead: int = 1):
        self.detector = detector
        top_k = detector.detect_cfg.top_k
        self.det_cap = top_k if det_cap is None else int(det_cap)
        if not 0 < self.det_cap <= top_k:
            # a cap past top_k would only fail at trace time with an opaque
            # broadcast error inside the fused post graph
            raise ValueError(f"det_cap must be in (0, {top_k}] "
                             f"(detector top_k); got {det_cap}")
        self.conf_thresh = (detector.detect_cfg.conf_thresh
                            if threshold is None else threshold)
        self.nms_thresh = (detector.detect_cfg.nms_thresh
                           if nms_thresh is None else nms_thresh)
        if cfg.score_floor <= 0:
            # detections_to_rows walks the all-zero class-0 rows when the
            # floor is <= 0 (My_test.py quirk); the fused path slices class 1
            # only, so refuse the configuration instead of silently diverging
            raise ValueError("FusedVideoTracker requires score_floor > 0")
        super().__init__(cfg, t_max=t_max, pad_n=self.det_cap)
        # bounded LRU like PyramidBoxDetector._jitted: a native-resolution
        # frame sweep would otherwise retain one compiled post executable per
        # distinct (width, height) for the tracker's lifetime
        from collections import OrderedDict, deque
        self._fused: "OrderedDict" = OrderedDict()
        self._fused_max = 16
        # Pipelined readback: step_frames dispatches chunk N+1 BEFORE blocking
        # on chunk N's packed readback — the slot-state dependency chain stays
        # on device (post(det_{N+1}, slots_N) consumes the async slots output
        # directly), so the host's readback RTT and replay overlap the
        # device's detect+associate of the next chunk.  `lookahead` = max
        # chunks in flight (0 disables pipelining).  Output-invariant:
        # chunks still replay strictly in order.
        self.lookahead = int(lookahead)
        self._pending: "deque" = deque()  # (packed, f, cap, t, pre_slots)

    def _fn(self, width: int, height: int):
        key = (width, height)
        fn = self._fused.get(key)
        if fn is not None:
            self._fused.move_to_end(key)
            return fn
        scale = jnp.asarray([width, height, width, height], jnp.float32)
        cap, floor, cfg = self.det_cap, self.cfg.score_floor, self.cfg

        @jax.jit
        def post(det, slots):
            # det: [F, 2, top_k, 5] straight from the detector's executable
            cls1 = det[:, 1, :cap, :]
            scores = cls1[..., 0]
            # prefix-take at the floor = detections_to_rows' cumprod walk
            ok = jnp.cumprod((scores >= floor).astype(jnp.int32),
                             axis=1).astype(bool)
            boxes = cls1[..., 1:5] * scale           # f32 mul, same as host
            # empty frame → the [[0, 0, 0, 0, 0.4]] sentinel row
            first = jnp.arange(cap) == 0
            none = ~ok[:, 0]
            scores = jnp.where(none[:, None] & first, jnp.float32(0.4), scores)
            boxes = jnp.where((none[:, None] & first)[..., None], 0.0, boxes)
            valid = ok | (none[:, None] & first)
            slots, (assign, finish, spawn, overflow) = _associate_chunk(
                slots, boxes, scores, valid, cfg.sigma_iou, cfg.sigma_dis,
                cfg.sigma_h, cfg.t_min, cfg.use_iou)
            rows = jnp.concatenate([boxes, scores[..., None]], axis=-1)
            f = det.shape[0]
            # ONE packed f32 output → ONE host readback per chunk.  Reading
            # rows/assign/finish/spawn/count/overflow as six separate
            # np.asarray calls costs six sequential round trips over the
            # ~30ms-RTT host↔device tunnel — measured 82 fps vs ~200 fps
            # packed on the fused bench leg.  f32 holds the integer fields
            # exactly (det indices < cap, slot ids < t_max, both << 2^24).
            packed = jnp.concatenate([
                rows.reshape(f, cap * 5),
                assign.astype(jnp.float32),
                finish.astype(jnp.float32),
                spawn.astype(jnp.float32),
                valid.sum(axis=1).astype(jnp.float32)[:, None],
                overflow.astype(jnp.float32)[:, None],
            ], axis=1)
            return slots, packed

        self._fused[key] = post
        if len(self._fused) > self._fused_max:
            self._fused.popitem(last=False)
        return post

    def step_frames(self, frames_u8: np.ndarray) -> None:
        """Advance F frames from a [F, H, W, 3] uint8 BGR chunk.

        Asynchronous up to `lookahead` chunks: the replay of the last chunk(s)
        completes at the next step_frames/flush call.  Do not interleave with
        the inherited step()/step_chunk() row API — those consume self.slots
        directly and would reorder against in-flight chunks."""
        f, h, w, _ = frames_u8.shape
        run = self.detector._compiled(w, h, self.conf_thresh, self.nms_thresh)
        det = run(self.detector.variables, frames_u8)   # async, stays on device
        pre_slots = self.slots
        self.slots, packed = self._fn(w, h)(det, pre_slots)
        self._pending.append((packed, f, self.det_cap, self.t_max, pre_slots))
        while len(self._pending) > self.lookahead:
            self._drain_one()

    @staticmethod
    def _parse(packed: np.ndarray, f: int, cap: int, t: int):
        rows = packed[:, :cap * 5].reshape(f, cap, 5)
        assign = packed[:, cap * 5:cap * 5 + t].astype(np.int32)
        finish = packed[:, cap * 5 + t:cap * 5 + 2 * t] > 0.5
        spawn = packed[:, cap * 5 + 2 * t:
                       cap * 5 + 2 * t + cap].astype(np.int32)
        count = packed[:, -2].astype(np.int32)
        overflow = packed[:, -1]
        return rows, assign, finish, spawn, count, overflow

    def _drain_one(self) -> None:
        packed, f, cap, t, pre_slots = self._pending.popleft()
        packed = np.asarray(packed)                    # the ONE blocking readback
        rows, assign, finish, spawn, count, overflow = self._parse(
            packed, f, cap, t)
        if overflow.sum():
            # slots exhausted mid-chunk (rare): every chunk dispatched after
            # this one ran its association against overflowed slot state —
            # recompute them all, in order, from their already-available rows
            # (no re-detect), then restart the pipeline
            self._redo_overflow(pre_slots, [(rows, count, f, cap)])
            return
        rows_list: List[np.ndarray] = [rows[i, :count[i]] for i in range(f)]
        self._replay(rows_list, assign, finish, spawn)

    def _redo_overflow(self, pre_slots, chunks) -> None:
        cfg = self.cfg
        for packed, f, cap, t, _ in self._pending:   # rows are slot-invariant
            p = np.asarray(packed)
            chunks.append((p[:, :cap * 5].reshape(f, cap, 5),
                           p[:, -2].astype(np.int32), f, cap))
        self._pending.clear()
        slots = pre_slots
        for k, (rows, count, f, cap) in enumerate(chunks):
            if k == 0:
                # this chunk DID overflow at the current capacity — re-running
                # it unchanged deterministically overflows again and wastes a
                # device dispatch + readback; grow first.  Later pending
                # chunks keep try-first (their status at the grown size is
                # unknown).
                self.t_max = max(self.t_max, slots.alive.shape[0] * 2)
            while True:
                if slots.alive.shape[0] < self.t_max:
                    slots = self._grow(slots, self.t_max)
                    self._hist += [None] * (self.t_max - len(self._hist))
                valid = np.arange(cap) < count[:, None]
                new_slots, (assign, finish, spawn, overflow) = _associate_chunk(
                    slots, jnp.asarray(rows[..., :4]),
                    jnp.asarray(rows[..., 4]), jnp.asarray(valid),
                    cfg.sigma_iou, cfg.sigma_dis, cfg.sigma_h, cfg.t_min,
                    cfg.use_iou)
                assign, finish, spawn, overflow = jax.device_get(
                    (assign, finish, spawn, overflow))
                if not overflow.sum():
                    break
                self.t_max *= 2
            slots = new_slots
            self._replay([rows[i, :count[i]] for i in range(f)],
                         assign, finish, spawn)
        self.slots = slots

    def flush(self) -> List[dict]:
        while self._pending:                          # drain the pipeline
            self._drain_one()
        return super().flush()


def track_video_fused(video_path: str, detector, cfg: TrackerConfig = TRACKER,
                      batch_size: int = 8, frame_size=(640, 480),
                      det_cap: int | None = None) -> List[dict]:
    """`track_video` with the fused single-call-per-chunk pipeline."""
    import cv2

    tracker = FusedVideoTracker(detector, cfg, det_cap=det_cap)
    cap = cv2.VideoCapture(video_path)
    batch: List[np.ndarray] = []

    def run_batch():
        if batch:
            tracker.step_frames(np.stack(batch))
            batch.clear()

    while True:
        ret, frame = cap.read()
        if not ret:
            break
        batch.append(cv2.resize(frame, frame_size))
        if len(batch) == batch_size:
            run_batch()
    run_batch()
    cap.release()
    return tracker.flush()
