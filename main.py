#!/usr/bin/env python
"""Reference-parity launcher (R: main.py): see metaasr_tpu/cli.py."""

from metaasr_tpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
