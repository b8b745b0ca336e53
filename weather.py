#!/usr/bin/env python
"""Repo-root launcher for the unified CLI: ``python weather.py pmg --mode ...``."""

import sys

from heuristic_style_transfer_for_real_time_efficient_weather_attribute_detection_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
