#!/usr/bin/env python
"""Reference-compatible CLI entry point (mirrors /root/reference/main.py).

Usage:
  python main.py --input_path pc_examples/mouse.npy --input_type pc_normal
  python main.py --input_dir examples/ --input_type mesh [--mc] [--sampling]
"""
from meshanything_tpu.cli import main

if __name__ == "__main__":
    main()
