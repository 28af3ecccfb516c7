"""Evaluation data iterator.

Yields (BGR image, [N,4] int32 xywh target, 1-based img_id) at native resolution
with no transform — the protocol of utils/data_collector.py:7-56.
"""
from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np

from fdt.data.anno import parse_anno_file


class EvalCollector:
    def __init__(self, anno_file: str, process_index: int | None = None,
                 process_count: int | None = None):
        """Optional multi-host sharding: each process takes a CONTIGUOUS block
        of the record list (the DCN input-sharding layer).  Blocks — not
        strides — so that concatenating per-process dumps in process order
        preserves the unsharded accumulation order; fdt.eval.pr.merge_raw
        then reproduces the single-process dump bit-exactly."""
        self.records = parse_anno_file(anno_file)
        self.start_id = 0
        if process_count and process_count > 1:
            n = len(self.records)
            lo = process_index * n // process_count
            hi = (process_index + 1) * n // process_count
            self.records = self.records[lo:hi]
            self.start_id = lo

    def __len__(self) -> int:
        return len(self.records)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray, int]]:
        import cv2
        for i, rec in enumerate(self.records):
            img = cv2.imread(rec.path)
            if img is None:
                raise FileNotFoundError(rec.path)
            # img_id stays GLOBAL under sharding: skip_ids (MTCNN's image
            # 2852, My_test_mtcnn.py:27), --limit, and display filenames all
            # carry whole-dataset semantics
            yield img, rec.boxes_xywh, self.start_id + i + 1
