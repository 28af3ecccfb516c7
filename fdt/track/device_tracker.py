"""IoU-tracker greedy association as one jitted lax.scan over frames.

The reference association loop (iouTracke_cal.py:126-155) is inherently
sequential — each frame's matches consume detections, and tracks are visited
in list order — so fdt.track.iou_tracker runs it on host.  This module is the
SURVEY §7 device formulation: the *decision process* (greedy IoU argmax with
consumption, finish/drop rules, slot allocation) runs entirely on device as a
`lax.scan` over frames with a `fori_loop` over track slots, and emits one
small integer record per frame:

    assign [T]  — detection index matched to each slot (−1 none)
    finish [T]  — slot finished this frame (reached the dump list)
    spawn  [N]  — slot id spawned for each unmatched detection (−1 none)

The host replays those records to rebuild the full box histories — zero IoU
math on host, one device→host transfer per frame *chunk* rather than the
reference's per-frame per-track numpy loop.

Exactness: slot iteration follows monotone creation order, which equals the
reference's active-list order (matched tracks keep relative order, new tracks
append); detection consumption uses masked argmax over original indices,
which picks the same element as the reference's shrinking-list argmax
(deletion preserves relative order).  All three faithful quirks of the host
tracker are reproduced (zero-detection frames silently drop tracks; finish
needs len > t_min strictly; flush uses len >= t_min).  The only divergence
channel is float32 IoU vs the host's float64 at exact-threshold boundaries;
tests/test_tracker.py checks bit-equal tracks on randomized streams.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fdt.config import TRACKER, TrackerConfig


@dataclasses.dataclass
class _Slots:
    """Device slot state (arrays of extent [T])."""
    last_box: jnp.ndarray   # [T, 4]
    max_score: jnp.ndarray  # [T]
    length: jnp.ndarray     # [T] i32
    order: jnp.ndarray      # [T] i32 creation counter (_DEAD_ORDER = dead)
    alive: jnp.ndarray      # [T] bool
    next_key: jnp.ndarray   # [] i32 global creation counter


jax.tree_util.register_dataclass(
    _Slots, data_fields=["last_box", "max_score", "length", "order", "alive",
                         "next_key"], meta_fields=[])


# Dead-slot sentinel for the int32 creation counter: larger than any live
# key (a float counter would lose integer precision past 2^24 spawned tracks
# and silently corrupt visit order on very long streams).
_DEAD_ORDER = jnp.iinfo(jnp.int32).max


def init_slots(t_max: int) -> _Slots:
    return _Slots(last_box=jnp.zeros((t_max, 4), jnp.float32),
                  max_score=jnp.zeros((t_max,), jnp.float32),
                  length=jnp.zeros((t_max,), jnp.int32),
                  order=jnp.full((t_max,), _DEAD_ORDER, jnp.int32),
                  alive=jnp.zeros((t_max,), bool),
                  next_key=jnp.zeros((), jnp.int32))


def _iou_row(boxes, ref):
    """IoU of [N,4] boxes vs one box (matches _iou_to_last semantics)."""
    lt = jnp.maximum(boxes[:, :2], ref[:2])
    rb = jnp.minimum(boxes[:, 2:], ref[2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[:, 0] * wh[:, 1]
    a = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    b = (ref[2] - ref[0]) * (ref[3] - ref[1])
    return inter / (a + b - inter)


def _distance_row(boxes, ref):
    """Center+size pseudo-distance (calculate_distance, calc_performance.py:34-51)."""
    d_xy = (ref[2:] + ref[:2]) / 2 - (boxes[:, 2:] + boxes[:, :2]) / 2
    d_sz = (boxes[:, 2:] - boxes[:, :2]) - (ref[2:] - ref[:2])
    d_z = (d_sz[:, 0] + d_sz[:, 1]) / 2
    dis = d_z * d_z + d_xy[:, 0] ** 2 + d_xy[:, 1] ** 2
    return dis ** 0.25


@functools.partial(jax.jit, static_argnames=("use_iou",))
def _associate_chunk(slots: _Slots, det_boxes, det_scores, det_valid,
                     sigma_iou, sigma_dis, sigma_h, t_min, use_iou: bool):
    """Run the greedy association over a chunk of frames.

    det_boxes [F,N,4], det_scores [F,N], det_valid [F,N] →
    (new slots, (assign [F,T] i32, finish [F,T] bool, spawn [F,N] i32,
     overflow [F] i32)).
    """
    t_max = slots.alive.shape[0]

    def frame_step(slots, frame):
        boxes, scores, valid = frame
        n = boxes.shape[0]
        visit = jnp.argsort(jnp.where(slots.alive, slots.order, _DEAD_ORDER))

        def body(i, carry):
            slots, consumed, assign, finish = carry
            s = visit[i]
            alive = slots.alive[s]
            rem = valid & ~consumed
            any_rem = jnp.any(rem)
            if use_iou:
                aff = jnp.where(rem, _iou_row(boxes, slots.last_box[s]), -jnp.inf)
                best = jnp.argmax(aff)
                hit = aff[best] > sigma_iou
            else:
                aff = jnp.where(rem, _distance_row(boxes, slots.last_box[s]),
                                jnp.inf)
                best = jnp.argmin(aff)
                hit = aff[best] < sigma_dis
            matched = alive & any_rem & hit
            # matched: extend track, consume detection
            slots = dataclasses.replace(
                slots,
                last_box=slots.last_box.at[s].set(
                    jnp.where(matched, boxes[best], slots.last_box[s])),
                max_score=slots.max_score.at[s].set(
                    jnp.where(matched, jnp.maximum(slots.max_score[s],
                                                   scores[best]),
                              slots.max_score[s])),
                length=slots.length.at[s].set(
                    slots.length[s] + matched.astype(jnp.int32)))
            consumed = consumed.at[best].set(consumed[best] | matched)
            assign = assign.at[s].set(jnp.where(matched, best, assign[s]))
            # unmatched with detections remaining: finish or discard
            # (any_rem False = the reference's silent drop, line 130)
            dies = alive & ~matched
            fin = (dies & any_rem & (slots.max_score[s] > sigma_h)
                   & (slots.length[s] > t_min))
            slots = dataclasses.replace(
                slots, alive=slots.alive.at[s].set(slots.alive[s] & matched))
            finish = finish.at[s].set(fin)
            return slots, consumed, assign, finish

        carry = (slots, ~valid, jnp.full((t_max,), -1, jnp.int32),
                 jnp.zeros((t_max,), bool))
        # Trip count = live tracks, not slot capacity: `visit` sorts alive
        # slots first (dead order = _DEAD_ORDER), and the body is an exact
        # no-op for a dead slot (matched/dies/fin all False, no state
        # writes), so stopping after the last alive slot is semantics-
        # preserving.  This is the serial depth of the whole tracker — at
        # t_max=256 with ~17 live tracks it cuts the per-frame loop 15×
        # (each TPU loop iteration costs ~50µs of serial small-op latency;
        # measured 61 → >100 fps on the fused bench leg).
        slots, consumed, assign, finish = jax.lax.fori_loop(
            0, jnp.sum(slots.alive.astype(jnp.int32)), body, carry)

        # spawn new tracks from unconsumed detections, in detection order
        free = ~slots.alive                       # includes slots freed above
        free_slots = jnp.argsort(~free)           # free slot ids first, stable
        n_free = jnp.sum(free)
        new = valid & ~consumed
        rank = jnp.cumsum(new) - 1                # spawn rank per detection
        can = new & (rank < n_free)
        slot_of = jnp.where(can, free_slots[jnp.clip(rank, 0, t_max - 1)], -1)
        overflow = jnp.sum(new & ~can).astype(jnp.int32)

        det_ids = jnp.arange(n)
        # route non-spawning (-1) entries to a dump row past t_max: duplicate
        # scatter indices have no write-order guarantee, so a -1 must never
        # alias a real slot
        safe_slot = jnp.where(can, slot_of, t_max)
        spawn_mask = jnp.zeros((t_max + 1,), bool).at[safe_slot].set(True)[:t_max]
        # per-slot gather of its spawning detection
        det_of_slot = jnp.zeros((t_max + 1,), jnp.int32).at[safe_slot].set(
            det_ids)[:t_max]
        slots = dataclasses.replace(
            slots,
            last_box=jnp.where(spawn_mask[:, None], boxes[det_of_slot],
                               slots.last_box),
            max_score=jnp.where(spawn_mask, scores[det_of_slot],
                                slots.max_score),
            length=jnp.where(spawn_mask, 1, slots.length),
            order=jnp.where(spawn_mask,
                            slots.next_key + rank[det_of_slot].astype(jnp.int32),
                            jnp.where(slots.alive, slots.order, _DEAD_ORDER)),
            alive=slots.alive | spawn_mask,
            next_key=slots.next_key + jnp.sum(can).astype(jnp.int32))
        return slots, (assign, finish, slot_of, overflow)

    return jax.lax.scan(frame_step, slots, (det_boxes, det_scores, det_valid))


class DeviceIoUTracker:
    """Drop-in tracker whose association decisions run on device.

    Same step()/flush() contract and output schema as
    fdt.track.iou_tracker.IoUTracker; feed frames in chunks for throughput
    (step_chunk) or one at a time (step)."""

    def __init__(self, cfg: TrackerConfig = TRACKER, t_max: int = 256,
                 pad_n: int = 64):
        self.cfg = cfg
        self.t_max = t_max
        self.pad_n = pad_n
        self.slots = init_slots(t_max)
        self.frame_num = 0
        # host-side mirrors, indexed by slot
        self._hist: List[dict | None] = [None] * t_max
        self.finished: List[dict] = []

    def _pad(self, rows_list: Sequence[np.ndarray]):
        n = self.pad_n
        need = max([1] + [len(r) for r in rows_list])
        while n < need:
            n *= 2
        # persist the grown size — otherwise chunks whose max detection count
        # straddles the old boundary alternate pad widths and thrash the jit
        # cache with retraces
        self.pad_n = n
        f = len(rows_list)
        boxes = np.zeros((f, n, 4), np.float32)
        scores = np.zeros((f, n), np.float32)
        valid = np.zeros((f, n), bool)
        for i, rows in enumerate(rows_list):
            rows = np.asarray(rows, np.float32).reshape(-1, 5)
            boxes[i, :len(rows)] = rows[:, :4]
            scores[i, :len(rows)] = rows[:, 4]
            valid[i, :len(rows)] = True
        return boxes, scores, valid

    def _grow(self, slots: _Slots, t_max: int) -> _Slots:
        """Copy slot state into larger buffers (track-count auto-scaling)."""
        pad = t_max - slots.alive.shape[0]
        return _Slots(
            last_box=jnp.pad(slots.last_box, ((0, pad), (0, 0))),
            max_score=jnp.pad(slots.max_score, (0, pad)),
            length=jnp.pad(slots.length, (0, pad)),
            order=jnp.pad(slots.order, (0, pad),
                          constant_values=_DEAD_ORDER),
            alive=jnp.pad(slots.alive, (0, pad)),
            next_key=slots.next_key)

    def step_chunk(self, rows_list: Sequence[np.ndarray]) -> None:
        """Advance len(rows_list) frames; each entry is an [N,5] rows array."""
        cfg = self.cfg
        boxes, scores, valid = self._pad(rows_list)
        while True:
            new_slots, (assign, finish, spawn, overflow) = _associate_chunk(
                self.slots, boxes, scores, valid, cfg.sigma_iou, cfg.sigma_dis,
                cfg.sigma_h, cfg.t_min, cfg.use_iou)
            if not int(np.asarray(overflow).sum()):
                break
            # slots exhausted mid-chunk: double capacity and re-run the chunk
            # from the (unmodified) pre-chunk state — the host tracker it
            # mirrors is unbounded, so capacity must never change results
            self.t_max *= 2
            self.slots = self._grow(self.slots, self.t_max)
            self._hist = self._hist + [None] * (self.t_max - len(self._hist))
        self.slots = new_slots
        self._replay(rows_list, np.asarray(assign), np.asarray(finish),
                     np.asarray(spawn))

    def _replay(self, rows_list: Sequence[np.ndarray], assign: np.ndarray,
                finish: np.ndarray, spawn: np.ndarray) -> None:
        """Rebuild host-side box histories from the device records."""
        for f in range(len(rows_list)):
            self.frame_num += 1
            rows = np.asarray(rows_list[f], np.float32).reshape(-1, 5)
            # replay in creation order = reference list order
            live = [s for s in range(self.t_max) if self._hist[s] is not None]
            for s in sorted(live, key=lambda s: self._hist[s]["_key"]):
                d = assign[f, s]
                if d >= 0:
                    t = self._hist[s]
                    t["bboxes"].append(list(map(float, rows[d, :4])))
                    t["max_score"] = max(t["max_score"], float(rows[d, 4]))
                elif finish[f, s]:
                    t = self._hist[s]
                    del t["_key"]
                    self.finished.append(t)
                    self._hist[s] = None
                else:
                    self._hist[s] = None  # discarded / silently dropped
            for d in range(len(rows)):
                s = spawn[f, d]
                if s >= 0:
                    self._hist[s] = {
                        "bboxes": [list(map(float, rows[d, :4]))],
                        "max_score": float(rows[d, 4]),
                        "start_frame": self.frame_num,
                        "_key": (self.frame_num, d)}

    def step(self, det_rows: np.ndarray) -> None:
        self.step_chunk([np.asarray(det_rows)])

    def flush(self) -> List[dict]:
        """Final flush (iouTracke_cal.py:174-175): len >= t_min, active order.

        Like IoUTracker.flush, leaves the tracker empty-but-usable: device
        slot state resets alongside the host mirrors, so further step()s
        start from scratch instead of matching against ghost slots."""
        live = [s for s in range(self.t_max) if self._hist[s] is not None]
        for s in sorted(live, key=lambda s: self._hist[s]["_key"]):
            t = self._hist[s]
            if (t["max_score"] > self.cfg.sigma_h
                    and len(t["bboxes"]) >= self.cfg.t_min):
                del t["_key"]
                self.finished.append(t)
            self._hist[s] = None
        self.slots = init_slots(self.t_max)
        return self.finished
