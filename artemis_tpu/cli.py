"""Command-line entry point (reference: src/main.cpp).

Usage:  python -m artemis_tpu.cli -i input.deck [-d data_dir] [key=value ...]
Return codes: 0 complete, 1 failed (2 = walltime timeout, later).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="artemis_tpu")
    ap.add_argument("-i", "--input", required=True, help="input deck file")
    ap.add_argument("-d", "--data", default=".", help="output data directory")
    ap.add_argument("-r", "--restart", default=None, help="restart checkpoint (.rst.npz)")
    ap.add_argument("-n", "--ncycle-out", type=int, default=0, help="stdout log interval")
    ap.add_argument("-t", "--walltime", type=float, default=None,
                    help="wall-clock limit in seconds (exit code 2 on timeout)")
    ap.add_argument("--profile", type=int, default=0, metavar="N",
                    help="time N instrumented cycles per driver phase and "
                         "print the table before the run (Kokkos-Tools "
                         "named-kernel profiling analogue)")
    ap.add_argument("--profile-kernels", type=int, default=0, metavar="N",
                    help="time every Pallas kernel launch over N eager "
                         "cycles and print the per-kernel table before the "
                         "run (below-phase attribution; see "
                         "profiling.kernel_table)")
    ap.add_argument("overrides", nargs="*", help="block/key=value overrides")
    args = ap.parse_args(argv)

    import os

    # honor JAX_PLATFORM_NAME/JAX_PLATFORMS=cpu BEFORE any backend init:
    # plugin platforms (the axon TPU tunnel) otherwise still initialize
    # during backend discovery and a dead tunnel hangs the process
    if "cpu" in (os.environ.get("JAX_PLATFORM_NAME", ""),
                 os.environ.get("JAX_PLATFORMS", "")):
        import jax

        jax.config.update("jax_platforms", "cpu")

    from .simulation import Simulation

    # graceful SIGTERM: stop at the next chunk boundary and checkpoint
    import signal

    from . import driver as _driver

    def _on_term(signum, frame):  # noqa: ARG001
        _driver.STOP_REQUESTED = True

    try:
        signal.signal(signal.SIGTERM, _on_term)
    except ValueError:  # not the main thread
        pass

    try:
        sim = Simulation(args.input, overrides=args.overrides, data_dir=args.data,
                         restart=args.restart)
        sim.print_config()
        if args.profile > 0:
            from .profiling import phase_table

            phase_table(sim, ncycles=args.profile)
        if args.profile_kernels > 0:
            from .profiling import kernel_table

            kernel_table(sim, ncycles=args.profile_kernels)
        zcps = sim.run(log_every=args.ncycle_out, walltime=args.walltime)
        print(f"walltime-rate: {zcps:.3e} zone-cycles/sec "
              f"(ncycle={sim.tm.ncycle}, t={sim.tm.time:.6e}, {sim.status})")
        if sim.status == "timeout":
            # write a resume checkpoint and signal the self-resubmit pattern
            # (DriverStatus::timeout -> exit code 2, src/main.cpp:108-138)
            from .io.dumps import RestartOutput

            pid = sim.pin.get_or_add_str("parthenon/job", "problem_id", "artemis")
            import os as _os

            ro = RestartOutput(sim, 1.0, _os.path.join(sim.data_dir, f"{pid}.walltime"))
            ro._write(sim.state, sim.tm, tag="final")
            return 2
    except Exception as e:  # noqa: BLE001
        print(f"artemis_tpu failed: {e}", file=sys.stderr)
        raise
    return 0


if __name__ == "__main__":
    sys.exit(main())
