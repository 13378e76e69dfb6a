"""Large-gallery match benchmark: exact top-k at the ≥1M-identity regime.

The design headline of this framework is that FAISS (reference
inference/extract_embeddings.py:595-645) collapses to an MXU matmul +
top-k on TPU. This bench measures that claim where it matters — N = 1M
gallery rows — timing BOTH the dense XLA path and the Pallas streaming
kernel (`ops/pallas_topk.py`) and parity-checking them against each other.

Measured (one v5e chip, N=1M, D=512, B=256, k=5, 2026-08-19):
int8 MXU 21.3k q/s > dense f32 17.6k > pallas stream 12.2k; pallas/dense
top-1 agreement 1.0, int8/dense 98.4% with max score err 1.6e-3 (the
disagreements are near-ties on random unit vectors; real match margins
are ~0.1). int8 is both the fastest AND the 4x-capacity layout at this
scale. Dense wins under ~DENSE_SCORES_MAX_BYTES of (B, N) score matrix,
where `auto_cosine_topk` picks it; the pallas kernel is the
unbounded-N streaming path.

Methodology matches bench.py: timed work runs inside ONE jit via lax.scan
with a checksum carried to host (tunnel-latency/elision-proof).

Prints one JSON line per measured configuration.
"""

import argparse
import json
import time

import numpy as np


def build_match_bench(matcher, k):
    import jax
    import jax.numpy as jnp

    def repeated(queries_stack, gallery):
        # ``gallery`` is a pytree ARGUMENT (f32 rows, or the int8
        # (codes, scales) pair) — never a closure: a closed-over 1M-row
        # device array bakes into the jaxpr as a literal, and the ~512MB
        # compile request blows the axon tunnel's body limit (HTTP 413).
        def body(carry, queries):
            scores, idx = matcher(queries, gallery, k)
            carry = carry + jnp.sum(scores) + jnp.sum(idx).astype(jnp.float32) * 1e-9
            return carry, ()

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), queries_stack)
        return carry

    return jax.jit(repeated)


def main():
    import jax
    import jax.numpy as jnp

    from facerecognition_tpu.ops.matcher import (
        cosine_topk,
        cosine_topk_int8,
        quantize_embeddings_int8,
    )
    from facerecognition_tpu.ops.pallas_topk import pallas_cosine_topk
    from facerecognition_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--gallery", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=8, help="batches per timed run")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--skip-dense", action="store_true",
                    help="skip the dense XLA path (HBM-heavy at 1M)")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    print(f"# gallery={args.gallery} dim={args.dim} batch={args.batch} "
          f"k={args.k} device={jax.devices()[0]}", flush=True)
    gal_np = rng.normal(size=(args.gallery, args.dim)).astype(np.float32)
    # Unit rows, matching Gallery's enrollment-time normalization — the
    # int8 layout REQUIRES it (cosine_topk_int8's contract: rows were
    # normalized before quantization; quantizing raw gaussian rows turns
    # the dequantized scores into non-cosine dot products).
    gal_np /= np.maximum(
        np.linalg.norm(gal_np, axis=1, keepdims=True), 1e-12
    )
    gallery = jnp.asarray(gal_np)
    del gal_np
    queries_stack = jnp.asarray(
        rng.normal(size=(args.iters, args.batch, args.dim)).astype(np.float32)
    )

    # int8 capacity path: quantize once (host-side would be exact too; this
    # measures the serving layout — codes + scales resident in HBM).
    gallery_q, gallery_scale = jax.jit(quantize_embeddings_int8)(gallery)
    gallery_q.block_until_ready()

    def int8_matcher(q, g, k):
        gq, gs = g  # the quantized pair rides in as the gallery argument
        return cosine_topk_int8(q, gq, gs, k)

    # --- parity: pallas + int8 vs dense on a query subsample ---------------
    q_small = queries_stack[0][:64]
    s_ref, i_ref = cosine_topk(q_small, gallery, args.k)
    s_pal, i_pal = pallas_cosine_topk(q_small, gallery, args.k)
    top1_agree = float(np.mean(np.asarray(i_ref[:, 0]) == np.asarray(i_pal[:, 0])))
    score_err = float(np.max(np.abs(np.asarray(s_ref) - np.asarray(s_pal))))
    print(json.dumps({
        "metric": "pallas_vs_dense_top1_agreement",
        "value": top1_agree,
        "unit": "fraction",
        "max_score_err": score_err,
    }), flush=True)
    assert top1_agree == 1.0, "pallas/dense top-1 mismatch"
    s_i8, i_i8 = int8_matcher(q_small, (gallery_q, gallery_scale), args.k)
    i8_agree = float(np.mean(np.asarray(i_ref[:, 0]) == np.asarray(i_i8[:, 0])))
    i8_err = float(np.max(np.abs(np.asarray(s_ref) - np.asarray(s_i8))))
    print(json.dumps({
        "metric": "int8_vs_dense_top1_agreement",
        "value": i8_agree,
        "unit": "fraction",
        "max_score_err": i8_err,
    }), flush=True)
    assert i8_err < 0.02, f"int8 scores off by {i8_err} (gallery layout bug?)"

    baseline = 1592.0  # reference batched GPU throughput (BASELINE.md)
    paths = [
        ("pallas_stream", pallas_cosine_topk, gallery),
        ("int8_mxu", int8_matcher, (gallery_q, gallery_scale)),
    ]
    if not args.skip_dense:
        paths.append(("dense_xla", cosine_topk, gallery))
    for name, matcher, gal_arg in paths:
        fn = build_match_bench(matcher, args.k)
        _ = float(fn(queries_stack, gal_arg))  # compile + warmup
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            checksum = float(fn(queries_stack, gal_arg))
            best = min(best, time.perf_counter() - t0)
            assert np.isfinite(checksum)
        qps = args.iters * args.batch / best
        print(json.dumps({
            "metric": f"gallery_match_qps_{name}_N{args.gallery}",
            "value": round(qps, 1),
            "unit": "queries/s",
            "vs_baseline": round(qps / baseline, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
