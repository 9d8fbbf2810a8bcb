"""Gradio web demo entry point (the reference's root app.py).

Launches the UI from rap_tpu.apps.webapp; the conversion / registration /
GLB pipeline also works headless via `rap_tpu.apps.webapp.run_rap_demo`.
"""

from rap_tpu.apps.webapp import main

if __name__ == "__main__":
    main()
