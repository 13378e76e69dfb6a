"""Streamlit demo: single-upload recognition (reference app/app.py:13-137).

Run with ``streamlit run facerecognition_tpu/apps/streamlit_app.py``.
Gated import: environments without streamlit get a clear message.
"""

from __future__ import annotations

import os


def run():
    try:
        import streamlit as st
    except ImportError as exc:  # pragma: no cover
        raise SystemExit(
            "streamlit is not installed — use the WSGI app instead: "
            "python -m facerecognition_tpu.apps.web_app"
        ) from exc

    import numpy as np
    from PIL import Image

    from facerecognition_tpu.inference.engine import (
        Gallery,
        RecognitionEngine,
    )

    st.title("Face recognition (TPU)")

    @st.cache_resource
    def get_engine():
        # Detect+align by default, like the reference demo (app/app.py:13 →
        # recognition_engine.py:84 use_face_detection=True): raw uploads get
        # the largest face detected and warped to the template, never a
        # whole-image embedding. FACE_DETECTOR=off opts out.
        detector = None
        if os.environ.get("FACE_DETECTOR", "on").lower() not in ("off", "0"):
            from facerecognition_tpu.preprocessing.face_detector import (
                FaceDetector,
            )

            detector = FaceDetector()
        engine = RecognitionEngine(
            model_type="arcface",
            checkpoint_path=os.environ.get("ARCFACE_CKPT"),
            threshold=0.5,
            detector=detector,
        )
        gallery_path = os.environ.get("FACE_DB", "databases/arcface/face_db.npy")
        if os.path.exists(gallery_path):
            engine.gallery = Gallery.load(gallery_path)
        return engine

    engine = get_engine()
    st.sidebar.write(f"Gallery identities: {len(engine.gallery)}")
    threshold = st.sidebar.slider("Threshold", 0.0, 1.0, 0.5, 0.05)
    engine.set_threshold(threshold)

    upload = st.file_uploader("Upload a face image", type=["jpg", "jpeg", "png"])
    if upload is not None:
        image = np.asarray(Image.open(upload).convert("RGB"))
        st.image(image, caption="Input", width=300)
        result = engine.recognize(image)
        if result["status"] != "success":
            st.error(result.get("message", "recognition failed"))
        else:
            st.subheader(result["identity"])
            st.write(f"confidence: {result['confidence']:.4f}")
            if result["top_k"]:
                st.table(
                    [{"identity": n, "score": f"{s:.4f}"} for n, s in result["top_k"]]
                )


def _in_streamlit_runtime() -> bool:
    try:
        from streamlit.runtime import exists

        return exists()
    except ImportError:
        return False


if __name__ == "__main__" or _in_streamlit_runtime():
    run()
