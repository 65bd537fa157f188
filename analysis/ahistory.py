"""Reader for artemis_tpu .hst history files.

Same file dialect as the reference's history output (and its
``analysis/ahistory.py`` reader): a ``#  History data`` sentinel, a label
line ``# [1]=time [2]=dt ...``, then whitespace-separated rows.  Handles
restart-appended files by using only the newest history section.
"""

from __future__ import annotations

import numpy as np


class ahistory:
    def __init__(self, filename: str):
        self.filename = filename
        starts = []
        labels = None
        with open(filename) as f:
            lines = f.readlines()
        for n, line in enumerate(lines):
            if line.strip() == "#  History data":
                starts.append(n)
                labels = lines[n + 1].strip().split("[")[1:]
        if not starts:
            raise ValueError(f"{filename}: not a history file")
        data = np.loadtxt(filename, skiprows=starts[-1], ndmin=2)
        self.dict = {}
        for n, full in enumerate(labels):
            self.dict[full.split("=")[1].strip()] = data[:, n]

    def Get(self, label: str):
        if label not in self.dict:
            return None
        return self.dict[label]

    def keys(self):
        return list(self.dict)
