#!/usr/bin/env python
"""Convenience shim: `python train.py --variant wgangp ...`
(same as `python -m generative_models_tpu`)."""
from generative_models_tpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
