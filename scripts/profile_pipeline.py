"""Per-stage breakdown of the fused detect→align→embed→match pipeline.

Same in-graph methodology as bench.py (lax.scan + checksum inside ONE jit:
the tunnel's dispatch latency and unreliable block_until_ready make naive
per-op timing meaningless). Each stage is scanned K times in isolation with
its real inputs pre-staged on device; reported ms is per batch (best of N).

Stages: resize(160→det), detector fwd, decode+NMS, MXU warp(160→112),
ArcFace ResNet50 embed, 10k-gallery top-k.

Usage: PYTHONPATH=/root/repo python scripts/profile_pipeline.py [--batch 256]
Writes a markdown table to stdout; paste into docs/PROFILE.md.
"""

import argparse
import json
import os
import time

import numpy as np

_ASSETS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets"
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--gallery", type=int, default=10_000)
    ap.add_argument("--det-size", type=int, default=128)
    ap.add_argument(
        "--extra",
        action="store_true",
        help="also time diagnostic sub-stages + candidate match kernels",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from facerecognition_tpu.models.arcface import ArcFaceModel
    from facerecognition_tpu.models.detector_net import (
        BlazeFaceNet,
        anchor_centers,
        detect_faces_batch,
    )
    from facerecognition_tpu.ops.image import normalize_imagenet_style
    from facerecognition_tpu.ops.matcher import cosine_topk, l2_normalize
    from facerecognition_tpu.ops.warp_mxu import (
        align_crop_mxu_batch,
        bilinear_resize_mxu_batch,
    )
    from facerecognition_tpu.utils.compile_cache import enable_compile_cache
    from facerecognition_tpu.utils.serialization import load_variables

    enable_compile_cache()
    B, K, DET = args.batch, args.iters, args.det_size
    rng = np.random.default_rng(0)

    from facerecognition_tpu.training.synthetic_faces import scene_batch

    frames_np, _, _, _ = scene_batch(rng, B, 160, max_faces=1, p_face=1.0)
    frames = jnp.asarray(frames_np.astype(np.float32))

    # Serving-default embedder (slim-9k preferred) — same resolver chain as
    # bench.py / serving, so the profile measures the pipeline that ships.
    from facerecognition_tpu.inference.extract_embeddings import (
        default_arcface_checkpoint,
    )

    emb_w = default_arcface_checkpoint() or os.path.join(
        _ASSETS, "arcface_synthid_512.msgpack"
    )
    if os.path.exists(emb_w):
        # Arch marker honored (slim checkpoints profile as-is).
        from facerecognition_tpu.inference.extract_embeddings import (
            load_arcface_checkpoint,
        )

        model, variables = load_arcface_checkpoint(emb_w)
    else:
        model = ArcFaceModel(embedding_size=512, dtype=jnp.float32)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3))
        )
    # Same checkpoint chain + decoding as serving (FaceDetector), so the
    # profile measures the detector the pipeline actually runs.
    from facerecognition_tpu.models.detector_net import build_detector_net
    from facerecognition_tpu.preprocessing.face_detector import (
        default_detector_checkpoint,
        load_detector_checkpoint,
    )

    det_w = default_detector_checkpoint()
    if det_w is not None:
        arch, det_vars, _ = load_detector_checkpoint(det_w)
        det_net = build_detector_net(arch)
    else:
        det_net = BlazeFaceNet()
        det_vars = det_net.init(
            jax.random.PRNGKey(1), jnp.zeros((1, DET, DET, 3))
        )
    anchors = jnp.asarray(anchor_centers(DET))
    gallery = jnp.asarray(
        rng.normal(size=(args.gallery, 512)).astype(np.float32)
    )

    # Pre-stage each stage's inputs (computed once, not timed).
    small = bilinear_resize_mxu_batch(frames, DET, DET, True)
    raw = det_net.apply(det_vars, small / 127.5 - 1.0)
    _, lms, _, _ = detect_faces_batch(raw, anchors, 0.3, 4)
    lm = jnp.clip(lms[:, 0] * (160.0 / DET), 0.0, 159.0)
    aligned = align_crop_mxu_batch(frames, lm, 112, True)
    x_emb = normalize_imagenet_style(aligned)
    emb = l2_normalize(model.apply(variables, x_emb).astype(jnp.float32))

    def timed(name, fn, *inputs):
        """Scan fn K times inside one jit; return best-of-3 ms/batch."""

        def body(carry, _):
            out = fn(*inputs)
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l).astype(jnp.float32) * 1e-9 for l in leaves)
            return carry + s, ()

        @jax.jit
        def run():
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
            return c

        float(run())  # compile + warmup
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            c = float(run())
            best = min(best, time.perf_counter() - t0)
            assert np.isfinite(c)
        return best / K * 1e3

    stages = {}
    stages["resize_160_to_det"] = timed(
        "resize", lambda f: bilinear_resize_mxu_batch(f, DET, DET, True), frames
    )
    stages["detector_fwd"] = timed(
        "det", lambda s: det_net.apply(det_vars, s / 127.5 - 1.0), small
    )
    stages["decode_nms"] = timed(
        "nms", lambda r: detect_faces_batch(r, anchors, 0.3, 4), raw
    )
    stages["warp_align_112"] = timed(
        "warp",
        lambda f, l: align_crop_mxu_batch(f, l, 112, True),
        frames,
        lm,
    )
    stages["embed_resnet50"] = timed(
        "embed",
        lambda a: model.apply(variables, normalize_imagenet_style(a)),
        aligned,
    )
    stages["match_topk"] = timed(
        # normalized=True: serving galleries store unit rows (bench.py) —
        # skips the per-call gallery normalize the round-3 table included.
        "match", lambda e: cosine_topk(e, gallery, 5, True), emb
    )
    if args.extra:
        # Diagnostic sub-stages / candidate kernels (not pipeline stages).
        stages["x_match_matmul_only"] = timed(
            "mm",
            lambda e: jnp.dot(
                e, gallery.T, preferred_element_type=jnp.float32
            ),
            emb,
        )
        scores0 = jnp.dot(emb, gallery.T, preferred_element_type=jnp.float32)
        stages["x_topk_lax"] = timed(
            "tk", lambda s: jax.lax.top_k(s, 5), scores0
        )

        def topk_blocked(s, k=5, block=1024):
            b, n = s.shape
            pad = (-n) % block
            if pad:
                s = jnp.pad(s, ((0, 0), (0, pad)), constant_values=-jnp.inf)
            nb = s.shape[1] // block
            sv, si = jax.lax.top_k(s.reshape(b, nb, block), k)
            cand = sv.reshape(b, nb * k)
            cidx = (
                si + (jnp.arange(nb) * block)[None, :, None]
            ).reshape(b, nb * k)
            v2, i2 = jax.lax.top_k(cand, k)
            return v2, jnp.take_along_axis(cidx, i2, axis=1)

        stages["x_topk_blocked"] = timed(
            "tkb", lambda s: topk_blocked(s), scores0
        )
        stages["x_topk_approx"] = timed(
            "tka",
            lambda s: jax.lax.approx_max_k(s, 5, recall_target=0.99),
            scores0,
        )
        stages["x_resize_f32"] = timed(
            "rsz32",
            lambda f: bilinear_resize_mxu_batch(f, DET, DET, False),
            frames,
        )

    total = sum(stages.values())
    print(f"\nPer-stage (B={B}, det={DET}², best-of-3, ms/batch):")
    print("| stage | ms | % | img/s |")
    print("|---|---|---|---|")
    for name, ms in stages.items():
        print(
            f"| {name} | {ms:.2f} | {100 * ms / total:.0f}% "
            f"| {B / ms * 1e3:,.0f} |"
        )
    print(f"| **sum** | {total:.2f} | 100% | {B / total * 1e3:,.0f} |")
    print(json.dumps({k: round(v, 3) for k, v in stages.items()}))


if __name__ == "__main__":
    main()
