"""Load-test the micro-batching serving API end to end over HTTP.

Starts the threaded WSGI app in-process (real engines: shipped detector +
ArcFace weights, synthetic gallery), fires concurrent clients at
``POST /recognize``, and reports throughput, latency percentiles, and the
batcher's coalescing stats. The reference stack has no serving benchmark at
all (its Flask app recognizes one upload per request, web_app.py:492-701);
this measures the production question it can't answer: what happens to
latency when N clients arrive at once.

Run: PYTHONPATH=/root/repo python examples/serving_bench.py \
        [--clients 32] [--requests 256] [--frame 256]
"""

import argparse
import io
import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=32)
    ap.add_argument("--requests", type=int, default=256)
    ap.add_argument("--frame", type=int, default=256)
    ap.add_argument("--port", type=int, default=8123)
    ap.add_argument("--gallery", type=int, default=1000)
    ap.add_argument("--max-delay-ms", type=float, default=5.0)
    ap.add_argument("--max-queue", type=int, default=1024,
                    help="MicroBatcher pending cap; small values provoke "
                    "429 load shedding under the client burst")
    ap.add_argument("--images-per-request", type=int, default=1,
                    help=">1 posts a multipart body with N images per "
                    "request (the multi-image /recognize serving body) — "
                    "amortizes per-request host cost; throughput_rps "
                    "counts bodies/s, throughput_imgs_s counts images/s")
    args = ap.parse_args()

    from facerecognition_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from facerecognition_tpu.apps.web_app import EngineRegistry, create_app
    from facerecognition_tpu.preprocessing.face_detector import FaceDetector

    registry = EngineRegistry(detector=FaceDetector(confidence_threshold=0.3))
    engine = registry.get("arcface")
    rng = np.random.default_rng(0)
    gal = rng.normal(size=(args.gallery, 512)).astype(np.float32)
    engine.gallery.add_many(
        [f"id_{i}" for i in range(args.gallery)], gal
    )
    app = create_app(
        registry,
        batcher_opts={
            "frame_size": (args.frame, args.frame),
            "max_delay_ms": args.max_delay_ms,
            "max_queue": args.max_queue,
        },
    )

    from socketserver import ThreadingMixIn
    from wsgiref.simple_server import WSGIServer, make_server

    class _Srv(ThreadingMixIn, WSGIServer):
        daemon_threads = True
        request_queue_size = 128  # survive the concurrent client burst

    server = make_server("127.0.0.1", args.port, app, server_class=_Srv)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{args.port}/recognize"

    # One rendered face scene as the upload (JPEG-encoded once, shared).
    from PIL import Image

    from facerecognition_tpu.training.synthetic_faces import scene_batch

    n_per = max(1, args.images_per_request)
    frames, _, _, _ = scene_batch(
        rng, n_per, args.frame, max_faces=1, p_face=1.0
    )
    jpegs = []
    for i in range(n_per):
        buf = io.BytesIO()
        Image.fromarray(frames[i].astype(np.uint8)).save(
            buf, format="JPEG", quality=90
        )
        jpegs.append(buf.getvalue())

    if n_per == 1:
        payload, headers = jpegs[0], {"Content-Type": "image/jpeg"}
    else:
        # multipart body with N distinct JPEG parts (multi-image serving)
        boundary = "servingbenchboundary"
        parts = []
        for i, j in enumerate(jpegs):
            parts.append(
                (
                    f"--{boundary}\r\nContent-Disposition: form-data; "
                    f'name="file"; filename="f{i}.jpg"\r\n'
                    "Content-Type: image/jpeg\r\n\r\n"
                ).encode() + j + b"\r\n"
            )
        payload = b"".join(parts) + f"--{boundary}--\r\n".encode()
        headers = {
            "Content-Type": f"multipart/form-data; boundary={boundary}"
        }

    def post():
        req = urllib.request.Request(url, data=payload, headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=1800) as r:
                return json.loads(r.read())
        except (ConnectionResetError, ConnectionRefusedError):
            # one retry on a transport-level reset (kernel backlog burst) —
            # HTTP-level errors (429/5xx) propagate untouched
            with urllib.request.urlopen(req, timeout=1800) as r:
                return json.loads(r.read())

    # Warm with a CONCURRENT burst so the bucket sizes the timed run will
    # actually hit (not just bucket 1) are compiled before timing — a cold
    # fused compile runs minutes on TPU and would land inside the
    # measurement (and blow request timeouts) otherwise.
    print("warmup burst (compiles the fused bucket graphs)...", flush=True)
    warm_results = [None] * args.clients

    def warm_client(i):
        # Warmup only needs the bucket graphs compiled — with a small
        # --max-queue the burst legitimately sheds (429), and a cold
        # large-bucket fused compile can outlive the batcher's request
        # timeout (503). Back off and retry either until this client's
        # request lands (the compile finishes server-side and is cached).
        while True:
            try:
                warm_results[i] = post()
                return
            except urllib.error.HTTPError as e:
                if e.code not in (429, 503):
                    raise
                time.sleep(0.5)

    threads = [
        threading.Thread(target=warm_client, args=(i,))
        for i in range(args.clients)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r is not None for r in warm_results), "warmup request failed"
    first = warm_results[0]
    first_res = first["results"][0] if "results" in first else first
    print(f"warmup ok: identity={first_res['identity']!r}", flush=True)
    # Clean pre-run counter baseline (requests/batches/dispatch_s deltas).
    with urllib.request.urlopen(
        f"http://127.0.0.1:{args.port}/stats", timeout=60
    ) as r:
        base = json.loads(r.read())["models"]["arcface"]["batching"]

    latencies = []
    failures = [0]
    shed = [0]
    lat_lock = threading.Lock()
    n_total = args.requests
    counter = {"left": n_total}
    last_stats = [base]

    def client():
        while True:
            with lat_lock:
                if counter["left"] <= 0:
                    return
                counter["left"] -= 1
            t0 = time.perf_counter()
            was_shed = False
            try:
                res = post()
                if "results" in res:
                    ok = all(
                        r.get("status") == "success" for r in res["results"]
                    )
                else:
                    ok = res.get("status") == "success"
            except urllib.error.HTTPError as e:
                ok = False
                was_shed = e.code == 429
            except Exception:
                ok = False
            dt = time.perf_counter() - t0
            with lat_lock:
                if ok:
                    latencies.append(dt)
                    if res["batching"]["requests"] > last_stats[0]["requests"]:
                        last_stats[0] = res["batching"]
                elif was_shed:
                    shed[0] += 1
                else:
                    failures[0] += 1

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client) for _ in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    # Server-side view: the MicroBatcher's own latency percentiles and
    # queue counters (docs/SERVING.md "Overload behavior").
    with urllib.request.urlopen(
        f"http://127.0.0.1:{args.port}/stats", timeout=60
    ) as r:
        server_stats = (
            json.loads(r.read())["models"].get("arcface", {}).get("batching")
        )
    server.shutdown()

    if not latencies:
        raise SystemExit(f"all {n_total} requests failed")
    # Coalescing over the timed run only (counter deltas vs the warm burst;
    # the final in-run response carries the freshest counters).
    stats_end = server_stats if server_stats else last_stats[0]
    d_req = stats_end["requests"] - base["requests"]
    d_bat = stats_end["batches"] - base["batches"]
    # device duty cycle over the timed window: fraction of wall the
    # dispatcher thread spent inside fused device dispatches — <1 means the
    # host (decode/parse/respond) is the bottleneck, ~1 means the device is
    duty = None
    if "dispatch_s" in stats_end and "dispatch_s" in base:
        duty = round((stats_end["dispatch_s"] - base["dispatch_s"]) / wall, 3)
    lat = np.sort(np.asarray(latencies)) * 1000
    print(
        json.dumps(
            {
                "requests": n_total,
                "images_per_request": n_per,
                "failed": failures[0],
                "shed_429": shed[0],
                "clients": args.clients,
                "throughput_rps": round(len(latencies) / wall, 1),
                "throughput_imgs_s": round(len(latencies) * n_per / wall, 1),
                "p50_ms": round(float(lat[len(lat) // 2]), 1),
                "p99_ms": round(float(lat[min(int(len(lat) * 0.99), len(lat) - 1)]), 1),
                "mean_batch": round(d_req / d_bat, 2) if d_bat else None,
                "batches": d_bat,
                "device_duty_cycle": duty,
                "frame": args.frame,
                "server": server_stats,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
