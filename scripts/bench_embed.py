"""Embed-only throughput for ArcFace backbone variants on one chip.

Answers "what does the slim (2,2,2,2) backbone buy over the full ResNet50
(3,4,6,3) at serving batch sizes?" with the same honest in-graph methodology
as bench.py: the measured loop is a lax.scan inside ONE jit carrying a
checksum fetched to host (the axon tunnel's dispatch latency and unreliable
block_until_ready make naive per-dispatch timing meaningless here).

Counterpart of the reference's embed-only throughput cell
(notebooks/evaluate_facenet_kaggle.ipynb cell 26: 1,592 img/s max batched).

Usage:
    PYTHONPATH=/root/repo python scripts/bench_embed.py \
        [--batch 256] [--iters 16] [--variants 3,4,6,3 2,2,2,2]

Prints one JSON line per variant: {"stage_sizes", "img_per_sec", ...}.
"""

import argparse
import json
import time

import numpy as np


def bench_variant(stage_sizes, batch, iters):
    import jax
    import jax.numpy as jnp

    from facerecognition_tpu.models.arcface import ArcFaceModel
    from facerecognition_tpu.ops.image import normalize_imagenet_style
    from facerecognition_tpu.ops.matcher import l2_normalize

    model = ArcFaceModel(
        embedding_size=512, dtype=jnp.float32, stage_sizes=stage_sizes
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3))
    )
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (batch, 112, 112, 3)).astype(np.float32)
    stack = jnp.asarray(np.broadcast_to(frames, (iters,) + frames.shape))

    def repeated(stack):
        def body(carry, x):
            emb = model.apply(variables, normalize_imagenet_style(x))
            emb = l2_normalize(emb.astype(jnp.float32))
            return carry + jnp.sum(emb), ()

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), stack)
        return carry

    fn = jax.jit(repeated)
    _ = float(fn(stack))  # compile + warmup (hard sync via host fetch)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        checksum = float(fn(stack))
        best = min(best, time.perf_counter() - t0)
        assert np.isfinite(checksum)
    return iters * batch / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument(
        "--variants",
        nargs="+",
        default=["3,4,6,3", "2,2,2,2"],
        help="one or more comma-separated stage-size tuples",
    )
    args = ap.parse_args()

    from facerecognition_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    for spec in args.variants:
        stages = tuple(int(s) for s in spec.split(","))
        ips = bench_variant(stages, args.batch, args.iters)
        print(
            json.dumps(
                {
                    "stage_sizes": list(stages),
                    "img_per_sec": round(ips, 1),
                    "batch": args.batch,
                    "vs_reference_1592": round(ips / 1592.0, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
