"""Regenerate the LBPH recorded-golden fixture (lbph_golden.npz).

Run from the repo root after any INTENTIONAL LBPH numeric change:
    python tests/fixtures/make_lbph_golden.py
The paired test (tests/test_lbph.py::TestLBPCore::test_recorded_golden_fixture)
pins radius=2, neighbors=8, grid 5x4 — a non-default configuration so drift
in the parameterized paths is caught too.
"""

import os

import numpy as np
import jax.numpy as jnp

from facerecognition_tpu.models.lbph import chi2_alt_distances, lbph_features


def main():
    rng = np.random.default_rng(20260816)
    img = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    feats = np.asarray(lbph_features(jnp.asarray(img), 2, 8, 5, 4, 256))
    gallery = np.abs(rng.normal(size=(7, feats.shape[0]))).astype(np.float32)
    gallery /= gallery.sum(axis=1, keepdims=True)
    dists = np.asarray(
        chi2_alt_distances(jnp.asarray(feats), jnp.asarray(gallery))
    )
    out = os.path.join(os.path.dirname(__file__), "lbph_golden.npz")
    np.savez(out, image=img, features=feats, gallery=gallery, distances=dists)
    print(f"wrote {out}: features {feats.shape}, distances {dists}")


if __name__ == "__main__":
    main()
