"""Realtime latency benchmark: p50/p95 per-frame latency, 720p stream.

Measures the BASELINE.json realtime config ("720p video stream
detect→embed→match at 30 fps"): single-frame (batch=1) pipeline latency with
a TRUE sequential dependency — each frame's processing consumes the previous
frame's result inside one lax.scan, so the measured time is genuine
per-frame latency (pipelining across frames cannot hide it), immune to this
environment's untrustworthy dispatch timing.

Usage: python examples/realtime_bench.py [--frames 64] [--height 720]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--frames", type=int, default=64)
    parser.add_argument("--height", type=int, default=720)
    parser.add_argument("--width", type=int, default=1280)
    parser.add_argument("--gallery", type=int, default=10_000)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from facerecognition_tpu.models.arcface import ArcFaceModel
    from facerecognition_tpu.models.detector_net import (
        BlazeFaceNet,
        anchor_centers,
        detect_best_face,
    )
    from facerecognition_tpu.ops.image import normalize_imagenet_style
    from facerecognition_tpu.ops.matcher import cosine_topk, l2_normalize
    from facerecognition_tpu.ops.warp_mxu import (
        align_crop_mxu_batch,
        bilinear_resize_mxu_batch,
    )
    from facerecognition_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    DET = 128
    model = ArcFaceModel(embedding_size=512, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3)))
    det_net = BlazeFaceNet()
    det_vars = det_net.init(jax.random.PRNGKey(1), jnp.zeros((1, DET, DET, 3)))
    anchors = jnp.asarray(anchor_centers(DET))

    h, w = args.height, args.width

    def one_frame(frame):
        small = bilinear_resize_mxu_batch(frame[None], DET, DET)[0]
        raw = det_net.apply(det_vars, (small / 127.5 - 1.0)[None])[0]
        # One face per frame (the realtime contract): argmax decode — see
        # detector_net.detect_best_face (exact top-1 parity with NMS).
        _, lms, det_score = detect_best_face(raw, anchors)
        # per-axis clip — a single min(h,w) bound would cap x at h-1 on a
        # wide frame, collapsing landmarks for faces in the right portion
        lm = jnp.clip(
            lms * jnp.array([w / DET, h / DET]),
            0.0,
            jnp.array([w - 1.0, h - 1.0]),
        )
        aligned = align_crop_mxu_batch(frame[None], lm[None], 112)
        x = normalize_imagenet_style(aligned)
        emb = l2_normalize(model.apply(variables, x).astype(jnp.float32))
        # Gallery rows are unit-norm (enrollment contract) — skip the
        # per-frame (N, D) normalize pass, as in bench.py.
        scores, idx = cosine_topk(emb, gallery, 5, normalized=True)
        return scores[0, 0] + det_score

    def sequential(frames):
        # Each frame's pixels are perturbed by the previous result — a real
        # serial dependency chain, so total/time = true per-frame latency.
        def body(carry, frame):
            r = one_frame(frame + carry * 1e-12)
            return r, ()

        out, _ = jax.lax.scan(body, jnp.float32(0.0), frames)
        return out

    rng = np.random.default_rng(0)
    gal = rng.normal(size=(args.gallery, 512)).astype(np.float32)
    gal /= np.linalg.norm(gal, axis=1, keepdims=True)
    gallery = jnp.asarray(gal)
    frames = jnp.asarray(
        rng.integers(0, 256, (args.frames, h, w, 3)).astype(np.float32)
    )
    fn = jax.jit(sequential)
    _ = float(fn(frames))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(fn(frames))
        best = min(best, time.perf_counter() - t0)
    per_frame_ms = best / args.frames * 1e3
    print(
        json.dumps(
            {
                "metric": "p50_frame_latency_720p_detect_align_embed_match",
                "value": round(per_frame_ms, 3),
                "unit": "ms",
                "fps": round(1000.0 / per_frame_ms, 1),
                "meets_30fps": per_frame_ms < 33.3,
            }
        )
    )


if __name__ == "__main__":
    main()
