#!/usr/bin/env python
"""Serving entry point (mirrors /root/reference/app.py).

Launches the gradio UI when gradio is installed, otherwise a
dependency-free HTTP server with the same controls.

  python app.py --random_weights          # smoke-serving
  python app.py --pretrained_weights MeshAnything_350m.pth
"""
from meshanything_tpu.serving import main

if __name__ == "__main__":
    main()
