"""Application layer: WSGI web app (reference web_app.py parity) and the
Streamlit demo. The web app is framework-free (stdlib wsgiref) so it runs
in minimal images; mount it under any WSGI server in production."""
