"""Expose the analysis/ readers to the test package."""

import os
import sys

_ANALYSIS = os.path.join(os.path.dirname(__file__), "..", "analysis")
if _ANALYSIS not in sys.path:
    sys.path.insert(0, _ANALYSIS)

from ahistory import ahistory  # noqa: E402,F401
