#!/usr/bin/env python
"""HTTP detection server: micro-batched TPU serving for any detector family.

A capability beyond the reference (whose only online path is the per-frame
webcam loop, Video.py:106-129): concurrent POST /detect requests coalesce into
one device batch, so HTTP concurrency becomes MXU batch size.

  python scripts/serve.py --detector pyramid --net repo --port 8000
  curl -s -X POST --data-binary @face.jpg localhost:8000/detect
  curl -s localhost:8000/healthz
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse


def build_service(args):
    # cold-start latency: warm-cached executables cut the first request's
    # multi-minute compile to an executable reload (TPU backend only)
    from fdt.utils.cache import enable_tpu_compile_cache
    enable_tpu_compile_cache()
    from fdt.apps.serving import DetectionService
    kw = dict(threshold=args.threshold, max_batch=args.max_batch,
              max_wait_ms=args.max_wait_ms,
              frame_size=(args.frame_w, args.frame_h))
    mesh = None
    if args.dp_devices:  # shard each coalesced batch over the mesh
        if args.detector == "mtcnn":
            raise SystemExit("--dp_devices is not wired for the mtcnn cascade")
        from fdt.dist import make_mesh
        mesh = make_mesh(args.dp_devices)
    if args.detector == "pyramid":
        from fdt.models.loader import load_pyramidbox_detector
        det = load_pyramidbox_detector(args.net, args.weights,
                                       quant=args.quant, budget=5000,
                                       mesh=mesh)
        return DetectionService("pyramidbox", det, **kw)
    if args.detector == "facebox":
        from fdt.models.loader import load_facebox_detector
        det = load_facebox_detector(
            args.weights or "/root/reference/FACEBOX/faceboxes.pt",
            quant=args.quant, mesh=mesh)
        return DetectionService("facebox", det, **kw)
    if args.quant:
        raise SystemExit("--quant is not supported for the mtcnn cascade")
    from fdt.infer.mtcnn_device import (FAST_BUDGETS, MID_BUDGETS,
                                        load_device_cascade)
    if args.weights:  # comma-separated pnet,rnet,onet checkpoint paths
        paths = args.weights.split(",")
        if len(paths) != 3:
            raise SystemExit("--weights for mtcnn must be 'pnet.pt,rnet.pt,"
                             f"onet.pt' (got {len(paths)} paths)")
    else:
        base = "/root/reference/MTCNN/original_model"
        paths = [f"{base}/{n}_epoch.pt" for n in ("pnet", "rnet", "onet")]
    # budget ladder: typical scenes sweep the small tiers, crowded frames
    # escalate (sticky) — keep-set-identical either way
    det = load_device_cascade(*paths,
                              fast_budgets=(FAST_BUDGETS, MID_BUDGETS))
    return DetectionService("mtcnn", det, **kw)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--detector", default="pyramid",
                    choices=["pyramid", "facebox", "mtcnn"])
    ap.add_argument("--net", default="repo", help="pyramid variant")
    ap.add_argument("--weights", default=None,
                    help="checkpoint path; for --detector mtcnn: "
                         "'pnet.pt,rnet.pt,onet.pt'")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--frame_w", type=int, default=640)
    ap.add_argument("--frame_h", type=int, default=480)
    ap.add_argument("--threshold", type=float, default=0.4)
    ap.add_argument("--max_batch", type=int, default=32)
    ap.add_argument("--max_wait_ms", type=float, default=5.0)
    ap.add_argument("--quant", default=None, choices=[None, "int8"],
                    help="opt-in int8 quantized inference (pyramid/facebox)")
    ap.add_argument("--dp_devices", default=0, type=int,
                    help="data-parallel serving (pyramid/facebox): shard "
                         "each micro-batch over an n-device mesh")
    ap.add_argument("--no_warmup", action="store_true",
                    help="skip compiling all batch buckets at startup")
    args = ap.parse_args()

    from fdt.apps.serving import serve_http
    service = build_service(args)
    if not args.no_warmup:
        print("warming up batch buckets (compiles one executable per "
              "power-of-two batch size)...", flush=True)
        service.warmup()
    serve_http(service, args.host, args.port)


if __name__ == "__main__":
    main()
