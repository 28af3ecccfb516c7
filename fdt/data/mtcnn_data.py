"""MTCNN training data pipeline: imdb parsing, flips, batching, and the
stage-wise hard-mining data factories.

Re-implements MTCNN/mtcnn/core/imagedb.py:8-157, image_reader.py:5-160 and the
data_preprocess generators (gen_Pnet_train_data.py:51-169,
gen_Rnet_train_data.py:94-229, gen_Onet_train_data.py, assemble.py:5-47) with
explicit RandomState and without the intermediate pickle files.

Anno line format (shared with the reference):
  <image path> <label> [ox1 oy1 ox2 oy2] [lx1 ly1 … lx5 ly5]
  label: 1 positive, 0 negative, -1 part, -2 landmark
"""
from __future__ import annotations

import dataclasses
import os
from typing import Callable, Iterator, List, Sequence

import numpy as np


# ------------------------------------------------------------------ imdb layer

def parse_mtcnn_imdb(anno_file: str, prefix_path: str = "") -> List[dict]:
    """ImageDB.load_annotations equivalent (imagedb.py:76-121)."""
    imdb = []
    for line in open(anno_file):
        cells = line.strip().split(" ")
        path = cells[0].replace("\\", "/")
        if not os.path.exists(path):
            path = os.path.join(prefix_path, path)
        if not path.endswith(".jpg"):
            path += ".jpg"
        rec = {"image": path, "label": int(cells[1]), "flipped": False,
               "bbox_target": np.zeros(4), "landmark_target": np.zeros(10)}
        rest = cells[2:]
        if len(rest) in (4, 14):
            rec["bbox_target"] = np.array(rest[:4], float)
        if len(rest) == 14:
            rec["landmark_target"] = np.array(rest[4:], float)
        imdb.append(rec)
    return imdb


def append_flipped_images(imdb: List[dict]) -> List[dict]:
    """Mirror-augment every record (imagedb.py:125-157): bbox x-offsets negate
    and swap; landmark x → 1-x with eye and mouth point swaps."""
    out = list(imdb)
    for rec in imdb:
        bbox = rec["bbox_target"].copy()
        bbox[0], bbox[2] = -bbox[2], -bbox[0]
        lm = rec["landmark_target"].copy().reshape(5, 2)
        lm = np.asarray([(1 - x, y) for (x, y) in lm])
        lm[[0, 1]] = lm[[1, 0]]
        lm[[3, 4]] = lm[[4, 3]]
        out.append({"image": rec["image"], "label": rec["label"],
                    "bbox_target": bbox, "landmark_target": lm.reshape(10),
                    "flipped": True})
    return out


def mtcnn_batches(imdb: Sequence[dict], batch_size: int,
                  shuffle: bool = True,
                  rng: np.random.RandomState | None = None) -> Iterator:
    """One epoch of (images [B,S,S,3] uint8 BGR, labels [B], bbox [B,4],
    landmarks [B,10]) — TrainImageReader/get_minibatch semantics
    (image_reader.py:5-160; remainder batch dropped)."""
    import cv2
    rng = rng or np.random.RandomState(0)
    index = np.arange(len(imdb))
    if shuffle:
        rng.shuffle(index)
    for s in range(0, len(index) - batch_size + 1, batch_size):
        recs = [imdb[i] for i in index[s:s + batch_size]]
        ims, labels, bboxes, lms = [], [], [], []
        for r in recs:
            im = cv2.imread(r["image"])
            if r["flipped"]:
                im = im[:, ::-1, :]
            ims.append(im)
            labels.append(r["label"])
            bboxes.append(r["bbox_target"])
            lms.append(r["landmark_target"])
        yield (np.asarray(ims), np.array(labels, np.float32),
               np.vstack(bboxes).astype(np.float32),
               np.vstack(lms).astype(np.float32))


def assemble_annotations(output_file: str, anno_file_list: Sequence[str],
                         rng: np.random.RandomState | None = None,
                         base_num: int = 250_000) -> int:
    """Merge/subsample stage anno lists, cap 3·base_num with replacement
    (assemble.py:5-47)."""
    rng = rng or np.random.RandomState(0)
    if os.path.exists(output_file):
        os.remove(output_file)
    count = 0
    for anno_file in anno_file_list:
        lines = open(anno_file).readlines()
        n = min(len(lines), base_num * 3)
        # with replacement, like the reference (assemble.py:28-34 — its
        # no-replacement branch is commented out)
        idx_keep = rng.choice(len(lines), size=n)
        with open(output_file, "a+") as f:
            for i in idx_keep:
                f.write(lines[i])
                count += 1
    return count


# --------------------------------------------------------------- iou utilities

def _iou_one_to_many(box, boxes):
    """IoU of one [4+] box vs [N,4] (MTCNN/mtcnn/core/utils.py:5-42 — +1 areas)."""
    area = (box[2] - box[0] + 1) * (box[3] - box[1] + 1)
    areas = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    xx1 = np.maximum(box[0], boxes[:, 0])
    yy1 = np.maximum(box[1], boxes[:, 1])
    xx2 = np.minimum(box[2], boxes[:, 2])
    yy2 = np.minimum(box[3], boxes[:, 3])
    inter = np.maximum(0, xx2 - xx1 + 1) * np.maximum(0, yy2 - yy1 + 1)
    return inter / (area + areas - inter)


# ------------------------------------------------------- stage data generators

@dataclasses.dataclass
class GenStats:
    pos: int = 0
    neg: int = 0
    part: int = 0


def gen_pnet_train_data(anno_file: str, prefix: str, out_dir: str,
                        rng: np.random.RandomState | None = None,
                        neg_per_image: int = 50,
                        on_patch: Callable | None = None) -> GenStats:
    """Random-crop P-Net patch factory (gen_Pnet_train_data.py:51-169):
    IoU<0.3 negatives, ≥0.65 positives, ≥0.4 part faces, 12² patches with
    normalized corner offsets.  Writes images + pos_12/neg_12/part_12.txt.

    on_patch(kind, crop_box [4], offsets [4]|None) observes every emitted
    patch with its source crop geometry (tests verify IoU-bucket membership
    and offset-label inversion without replaying the sampling loop)."""
    import cv2
    rng = rng or np.random.RandomState(0)
    size_out = 12
    dirs = {k: os.path.join(out_dir, f"12/{k}") for k in ("positive", "negative", "part")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    anno_dir = os.path.join(out_dir, "anno_store")
    os.makedirs(anno_dir, exist_ok=True)
    f_pos = open(os.path.join(anno_dir, "pos_12.txt"), "w")
    f_neg = open(os.path.join(anno_dir, "neg_12.txt"), "w")
    f_part = open(os.path.join(anno_dir, "part_12.txt"), "w")
    st = GenStats()

    for line in open(anno_file):
        cells = line.strip().split(" ")
        img = cv2.imread(os.path.join(prefix, cells[0]))
        if img is None:
            continue
        boxes = np.array(cells[1:], dtype=np.int32).reshape(-1, 4)
        height, width, _ = img.shape

        neg_num = 0
        while neg_num < neg_per_image:
            size = rng.randint(size_out, min(width, height) // 2)
            nx, ny = rng.randint(0, width - size), rng.randint(0, height - size)
            crop = np.array([nx, ny, nx + size, ny + size])
            if np.max(_iou_one_to_many(crop, boxes)) < 0.3:
                patch = cv2.resize(img[ny:ny + size, nx:nx + size], (size_out, size_out),
                                   interpolation=cv2.INTER_LINEAR)
                path = os.path.join(dirs["negative"], f"{st.neg}.jpg")
                cv2.imwrite(path, patch)
                f_neg.write(f"{path} 0\n")
                if on_patch:
                    on_patch("neg", crop, None)
                st.neg += 1
                neg_num += 1

        for box in boxes:
            x1, y1, x2, y2 = box
            w, h = x2 - x1 + 1, y2 - y1 + 1
            if max(w, h) < 40 or x1 < 0 or y1 < 0:
                continue
            for _ in range(5):  # overlapping negatives
                size = rng.randint(size_out, min(width, height) // 2)
                dx = rng.randint(max(-size, -x1), w)
                dy = rng.randint(max(-size, -y1), h)
                nx1, ny1 = max(0, x1 + dx), max(0, y1 + dy)
                if nx1 + size > width or ny1 + size > height:
                    continue
                crop = np.array([nx1, ny1, nx1 + size, ny1 + size])
                if np.max(_iou_one_to_many(crop, boxes)) < 0.3:
                    patch = cv2.resize(img[ny1:ny1 + size, nx1:nx1 + size],
                                       (size_out, size_out), interpolation=cv2.INTER_LINEAR)
                    path = os.path.join(dirs["negative"], f"{st.neg}.jpg")
                    cv2.imwrite(path, patch)
                    f_neg.write(f"{path} 0\n")
                    if on_patch:
                        on_patch("neg", crop, None)
                    st.neg += 1
            for _ in range(20):  # positives + parts
                size = rng.randint(int(min(w, h) * 0.8), int(np.ceil(1.25 * max(w, h))))
                dx = rng.randint(int(-w * 0.2), max(int(w * 0.2), 1))
                dy = rng.randint(int(-h * 0.2), max(int(h * 0.2), 1))
                nx1 = max(x1 + w / 2 + dx - size / 2, 0)
                ny1 = max(y1 + h / 2 + dy - size / 2, 0)
                nx2, ny2 = nx1 + size, ny1 + size
                if nx2 > width or ny2 > height:
                    continue
                crop = np.array([nx1, ny1, nx2, ny2])
                iou = float(_iou_one_to_many(crop, box.reshape(1, -1))[0])
                off = ((x1 - nx1) / size, (y1 - ny1) / size,
                       (x2 - nx2) / size, (y2 - ny2) / size)
                patch = cv2.resize(img[int(ny1):int(ny2), int(nx1):int(nx2)],
                                   (size_out, size_out), interpolation=cv2.INTER_LINEAR)
                if iou >= 0.65:
                    path = os.path.join(dirs["positive"], f"{st.pos}.jpg")
                    cv2.imwrite(path, patch)
                    f_pos.write(f"{path} 1 %.2f %.2f %.2f %.2f\n" % off)
                    if on_patch:
                        on_patch("pos", crop, off)
                    st.pos += 1
                elif iou >= 0.4:
                    path = os.path.join(dirs["part"], f"{st.part}.jpg")
                    cv2.imwrite(path, patch)
                    f_part.write(f"{path} -1 %.2f %.2f %.2f %.2f\n" % off)
                    if on_patch:
                        on_patch("part", crop, off)
                    st.part += 1
    for f in (f_pos, f_neg, f_part):
        f.close()
    return st


def gen_hard_example_data(detect_fn: Callable[[np.ndarray], np.ndarray],
                          anno_file: str, prefix: str, out_dir: str,
                          image_size: int, neg_cap_per_image: int = 60,
                          on_patch: Callable | None = None) -> GenStats:
    """Hard-example factory for R/O-Net (gen_Rnet_train_data.py:94-229):
    run the previous stage's detector, squarify its boxes, and harvest
    IoU-bucketed 24²/48² patches with corner-offset labels.

    detect_fn(image) → [N,5] aligned boxes from the previous stage(s)
    (P-Net for image_size 24; P+R for 48).
    """
    import cv2
    from fdt.infer.mtcnn import square_bbox

    dirs = {k: os.path.join(out_dir, f"{image_size}/{k}")
            for k in ("positive", "negative", "part")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    anno_dir = os.path.join(out_dir, "anno_store")
    os.makedirs(anno_dir, exist_ok=True)
    f_pos = open(os.path.join(anno_dir, f"pos_{image_size}.txt"), "w")
    f_neg = open(os.path.join(anno_dir, f"neg_{image_size}.txt"), "w")
    f_part = open(os.path.join(anno_dir, f"part_{image_size}.txt"), "w")
    st = GenStats()

    for line in open(anno_file):
        cells = line.strip().split(" ")
        img = cv2.imread(os.path.join(prefix, cells[0]))
        if img is None:
            continue
        gts = np.array(list(map(float, cells[1:])), np.float32).reshape(-1, 4)
        dets = detect_fn(img)
        if dets is None or dets.shape[0] == 0:
            continue
        dets = square_bbox(dets)
        dets[:, 0:4] = np.round(dets[:, 0:4])
        neg_num = 0
        for box in dets:
            x1, y1, x2, y2 = box[:4].astype(int)
            w, h = x2 - x1 + 1, y2 - y1 + 1
            if w < 20 or x1 < 0 or y1 < 0 or x2 > img.shape[1] - 1 or y2 > img.shape[0] - 1:
                continue
            iou = _iou_one_to_many(box, gts)
            patch = cv2.resize(img[y1:y2 + 1, x1:x2 + 1],
                               (image_size, image_size), interpolation=cv2.INTER_LINEAR)
            if np.max(iou) < 0.3 and neg_num < neg_cap_per_image:
                path = os.path.join(dirs["negative"], f"{st.neg}.jpg")
                cv2.imwrite(path, patch)
                f_neg.write(f"{path} 0\n")
                if on_patch:
                    on_patch("neg", box[:4], None)
                st.neg += 1
                neg_num += 1
            else:
                gx1, gy1, gx2, gy2 = gts[int(np.argmax(iou))]
                off = ((gx1 - x1) / w, (gy1 - y1) / h, (gx2 - x2) / w, (gy2 - y2) / h)
                if np.max(iou) >= 0.65:
                    path = os.path.join(dirs["positive"], f"{st.pos}.jpg")
                    cv2.imwrite(path, patch)
                    f_pos.write(f"{path} 1 %.2f %.2f %.2f %.2f\n" % off)
                    if on_patch:
                        on_patch("pos", box[:4], off)
                    st.pos += 1
                elif np.max(iou) >= 0.4:
                    path = os.path.join(dirs["part"], f"{st.part}.jpg")
                    cv2.imwrite(path, patch)
                    f_part.write(f"{path} -1 %.2f %.2f %.2f %.2f\n" % off)
                    if on_patch:
                        on_patch("part", box[:4], off)
                    st.part += 1
    for f in (f_pos, f_neg, f_part):
        f.close()
    return st


def gen_landmark_data(anno_file: str, prefix: str, out_dir: str,
                      image_size: int = 48) -> int:
    """Landmark patch factory (gen_landmark_48.py): crop each GT face, emit a
    patch with label -2 and box-normalized 5-point landmarks.

    anno line: <path> <x1> <x2> <y1> <y2> <lx1> <ly1> … <lx5> <ly5>
    (CelebA-style bbox ordering used by the reference).
    """
    import cv2
    save_dir = os.path.join(out_dir, f"{image_size}/landmark")
    os.makedirs(save_dir, exist_ok=True)
    anno_dir = os.path.join(out_dir, "anno_store")
    os.makedirs(anno_dir, exist_ok=True)
    f_lm = open(os.path.join(anno_dir, f"landmark_{image_size}.txt"), "w")
    count = 0
    for line in open(anno_file):
        cells = line.strip().split(" ")
        img = cv2.imread(os.path.join(prefix, cells[0]))
        if img is None:
            continue
        x1, x2, y1, y2 = map(float, cells[1:5])
        lm = np.array(list(map(float, cells[5:15])), np.float32).reshape(5, 2)
        w, h = x2 - x1 + 1, y2 - y1 + 1
        if w <= 0 or h <= 0:
            continue
        crop = img[int(y1):int(y2) + 1, int(x1):int(x2) + 1]
        if crop.size == 0:
            continue
        patch = cv2.resize(crop, (image_size, image_size),
                           interpolation=cv2.INTER_LINEAR)
        norm = np.empty(10, np.float32)
        norm[0::2] = (lm[:, 0] - x1) / w
        norm[1::2] = (lm[:, 1] - y1) / h
        path = os.path.join(save_dir, f"{count}.jpg")
        cv2.imwrite(path, patch)
        f_lm.write(f"{path} -2 0 0 0 0 " + " ".join(f"{v:.4f}" for v in norm) + "\n")
        count += 1
    f_lm.close()
    return count
