"""f32-vs-int8 top-1 agreement on REAL trained embeddings.

The int8 match kernel (`ops/matcher.cosine_topk_int8`) is inexact
(per-row symmetric quantization shifts scores O(1e-3)); its committed
agreement number was measured on random unit vectors, whose top-1
margins are adversarially thin (98.4% agreement — bench_gallery.py).
Real trained-embedding galleries have real inter-identity margins, so
the serving-relevant number is agreement on actual embeddings. This
script measures it, replacing assertion with evidence (the reference's
FAISS path is exact — /root/reference/inference/extract_embeddings.py:
595-645 — so an inexact default must earn its place).

Protocol:
  1. Render `--ids` synthetic identities x 2 aligned samples each
     (enroll / probe) — the same generator that trained the serving
     checkpoint (training/synthetic_faces.identity_dataset).
  2. Embed both sets with the serving ArcFace checkpoint (bucketed,
     uint8 to device — axon leak discipline).
  3. Gallery A ("9k real"): the enrolled embeddings. Gallery B
     ("capacity"): A + `--extend-to` minus len(A) distractor rows built
     as renormalized random PAIRWISE MIXTURES of real embeddings
     (alpha~U(0.25,0.75) plus sigma=0.05 Gaussian) — on-manifold-ish
     distractors, much harder than isotropic random vectors.
  4. For each gallery: top-1 via dense f32 vs int8 on the probe set →
     agreement %, identity-correctness under both kernels, and top-1
     margin stats at the disagreements.

Writes docs/INT8_AGREEMENT.json and prints a summary.

Run: PYTHONPATH=/root/repo python scripts/int8_agreement.py \
        [--ids 9343] [--extend-to 1000000] [--out docs/INT8_AGREEMENT.json]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ids", type=int, default=9343)
    ap.add_argument("--extend-to", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="docs/INT8_AGREEMENT.json")
    ap.add_argument("--cache", default="/tmp/int8_agreement_ds.npz",
                    help="rendered-dataset cache (rendering dominates "
                    "wall time on small hosts)")
    args = ap.parse_args()

    from facerecognition_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from facerecognition_tpu.inference.extract_embeddings import (
        default_arcface_checkpoint,
        load_arcface_checkpoint,
    )
    from facerecognition_tpu.ops.image import normalize_imagenet_style
    from facerecognition_tpu.ops.matcher import (
        cosine_topk,
        cosine_topk_int8,
        l2_normalize,
        quantize_embeddings_int8_np,
    )
    from facerecognition_tpu.training.synthetic_faces import identity_dataset

    t0 = time.time()
    import os

    if args.cache and os.path.exists(args.cache):
        z = np.load(args.cache)
        imgs, labels = z["imgs"], z["labels"]
        if len(imgs) != args.ids * 2:
            raise SystemExit(
                f"cache {args.cache} has {len(imgs)} samples, expected "
                f"{args.ids * 2} — delete it or change --cache"
            )
        print(f"loaded cached dataset {imgs.shape}", flush=True)
    else:
        print(f"rendering {args.ids} ids x 2 samples ...", flush=True)
        imgs, labels = identity_dataset(args.ids, 2, seed=args.seed)
        if args.cache:
            np.savez(args.cache, imgs=imgs, labels=labels)
    print(f"dataset ready ({time.time()-t0:.0f}s)", flush=True)

    ckpt = default_arcface_checkpoint()
    if ckpt is None:
        raise SystemExit("no serving ArcFace checkpoint found in assets/")
    model, variables = load_arcface_checkpoint(ckpt)
    print(f"checkpoint: {ckpt}", flush=True)

    @jax.jit
    def embed(batch_u8):
        x = normalize_imagenet_style(batch_u8.astype(jnp.float32))
        e = model.apply(variables, x)
        return l2_normalize(e.astype(jnp.float32))

    def embed_all(arr):
        out = np.empty((len(arr), 512), np.float32)
        for i in range(0, len(arr), args.batch):
            chunk = arr[i : i + args.batch]
            pad = args.batch - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, chunk[:pad]])
            out[i : i + args.batch] = np.asarray(embed(jnp.asarray(chunk)))[
                : args.batch - pad if pad else args.batch
            ]
        return out

    # identity_dataset layout: row i*2+k → identity i, sample k; so [0::2]
    # enrolls one sample per identity (gallery row r = identity r) and
    # [1::2] probes with the other.
    enroll = embed_all(imgs[0::2])
    probes = embed_all(imgs[1::2])
    print(f"embedded {len(enroll)}+{len(probes)} ({time.time()-t0:.0f}s)",
          flush=True)

    rng = np.random.default_rng(args.seed + 1)

    def distractors(n):
        """Renormalized pairwise mixtures of real rows + small noise."""
        i = rng.integers(0, len(enroll), n)
        j = rng.integers(0, len(enroll), n)
        a = rng.uniform(0.25, 0.75, (n, 1)).astype(np.float32)
        d = a * enroll[i] + (1 - a) * enroll[j]
        d += rng.normal(0, 0.05, d.shape).astype(np.float32)
        return d / np.linalg.norm(d, axis=1, keepdims=True)

    def agreement(gal_np, tag):
        gal = jnp.asarray(gal_np)
        q8, s8 = quantize_embeddings_int8_np(gal_np)  # host-side (axon leak)
        q8, s8 = jnp.asarray(q8), jnp.asarray(s8)
        top_f, top_i = [], []
        sc_f = []
        k = 5
        f32_fn = jax.jit(lambda q, g: cosine_topk(q, g, k, normalized=True))
        i8_fn = jax.jit(lambda q, g, s: cosine_topk_int8(q, g, s, k))
        for i in range(0, len(probes), args.batch):
            chunk = probes[i : i + args.batch]
            pad = args.batch - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, chunk[:pad]])
            q = jnp.asarray(chunk)
            s, idx = f32_fn(q, gal)
            s2, idx2 = i8_fn(q, q8, s8)
            n_keep = args.batch - pad if pad else args.batch
            top_f.append(np.asarray(idx)[:n_keep, 0])
            top_i.append(np.asarray(idx2)[:n_keep, 0])
            sc_f.append(np.asarray(s)[:n_keep, :2])
        top_f = np.concatenate(top_f)
        top_i = np.concatenate(top_i)
        sc_f = np.concatenate(sc_f)
        agree = top_f == top_i
        margins = sc_f[:, 0] - sc_f[:, 1]
        truth = np.arange(len(probes))  # gallery row r = identity r
        res = {
            "gallery_rows": int(len(gal_np)),
            "probes": int(len(probes)),
            "top1_agreement_pct": round(100.0 * float(agree.mean()), 4),
            "disagreements": int((~agree).sum()),
            "f32_top1_correct_pct": round(
                100.0 * float((top_f == truth).mean()), 4
            ),
            "int8_top1_correct_pct": round(
                100.0 * float((top_i == truth).mean()), 4
            ),
            "median_top1_margin": round(float(np.median(margins)), 4),
            "min_margin_at_disagreement": (
                round(float(margins[~agree].min()), 6)
                if (~agree).any()
                else None
            ),
            "max_margin_at_disagreement": (
                round(float(margins[~agree].max()), 6)
                if (~agree).any()
                else None
            ),
        }
        print(f"[{tag}] {json.dumps(res)}", flush=True)
        return res

    report = {
        "checkpoint": ckpt,
        "protocol": __doc__.split("Protocol:")[1].split("Writes")[0].strip(),
        "real_9k": agreement(enroll, "real_9k"),
    }
    if args.extend_to > len(enroll):
        ext = np.concatenate(
            [enroll, distractors(args.extend_to - len(enroll))]
        )
        report["capacity_1m"] = agreement(ext, "capacity_1m")

    import pathlib

    pathlib.Path(args.out).write_text(json.dumps(report, indent=2) + "\n")
    print(f"wrote {args.out} ({time.time()-t0:.0f}s total)", flush=True)


if __name__ == "__main__":
    main()
