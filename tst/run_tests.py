#!/usr/bin/env python3
"""Regression suite runner (reference: tst/run_tests.py).

Suites are line-lists of test families under tst/suites/*.suite; each family
maps to a pytest module in tests/.  Usage:

    python tst/run_tests.py regression.suite
    python tst/run_tests.py serial.suite parallel.suite
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

FAMILIES = {
    "linwave": "tests/test_linwave.py",
    "advection": "tests/test_advection.py",
    "blast": "tests/test_blast.py",
    "coords": "tests/test_blast.py",
    "diffusion": "tests/test_diffusion.py",
    "alpha_disk": "tests/test_alpha_disk.py",
    "drag": "tests/test_drag.py",
    "disk": "tests/test_disk.py",
    "ssheet": "tests/test_ssheet.py",
    "strat": "tests/test_strat.py",
    "nbody": "tests/test_nbody.py",
    "binary": "tests/test_binary.py",
    "binary_adi": "tests/test_binary.py",
    "collisions": "tests/test_nbody.py",
    "disk_nbody": "tests/test_nbody.py",
    "radiation": "tests/test_radiation.py",
    "amr": "tests/test_amr.py tests/test_amr_multilevel.py "
           "tests/test_amr_radiation.py tests/test_amr_fused.py "
           "tests/test_amr_gather6.py tests/test_amr_siblings.py "
           "tests/test_amr_sharded.py tests/test_amr_adaptive.py",
    "decks": "tests/test_decks.py",
    "parallel": "tests/test_parallel.py",
    "restart": "tests/test_restart.py tests/test_outputs_restart.py",
    "pallas": "tests/test_pallas_stage.py tests/test_pallas_curv.py "
              "tests/test_pallas_fld.py",
    "f32": "tests/test_f32.py",
    "profiling": "tests/test_profiling.py",
}


def check_families_complete():
    """Every tests/test_*.py module must be mapped by some family —
    a new test module that is not in FAMILIES would silently never run
    in any suite (the reference CI runs everything per PR, ci.yml:28-96).
    Returns the list of unmapped modules (empty = complete)."""
    import glob

    mapped = {m for v in FAMILIES.values() for m in v.split()}
    present = {os.path.relpath(p, ROOT).replace(os.sep, "/")
               for p in glob.glob(os.path.join(ROOT, "tests", "test_*.py"))}
    return sorted(present - mapped)


def load_suite(name: str):
    path = name if os.path.exists(name) else os.path.join(HERE, "suites", name)
    fams = []
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if line:
                fams.append(line)
    return fams


def main(argv):
    if not argv:
        print(__doc__)
        return 2
    slow = "--slow" in argv
    argv = [a for a in argv if a != "--slow"]
    missing = check_families_complete()
    if missing:
        print("ERROR: test modules not mapped to any family (add them to "
              f"FAMILIES): {' '.join(missing)}", file=sys.stderr)
        return 2
    mods = []
    for suite in argv:
        for fam in load_suite(suite):
            mod = FAMILIES.get(fam)
            if mod is None:
                print(f"unknown test family {fam!r}", file=sys.stderr)
                return 2
            for m in mod.split():
                if m not in mods:
                    mods.append(m)
    cmd = [sys.executable, "-m", "pytest", "-q", *mods]
    if slow:
        cmd += ["-m", "slow or not slow"]
    print("+", " ".join(cmd))
    return subprocess.call(cmd, cwd=ROOT)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
