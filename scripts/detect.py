#!/usr/bin/env python
"""Checkout wrapper for `detjax-detect` (see detjax/cli/detect.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from detjax.cli.detect import main
if __name__ == "__main__":
    main()
