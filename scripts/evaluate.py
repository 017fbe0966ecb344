#!/usr/bin/env python
"""Checkout wrapper for `detjax-evaluate` (see detjax/cli/evaluate.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from detjax.cli.evaluate import main
if __name__ == "__main__":
    main()
