"""Command-line entry point.

The reference ships a windowed binary (src/main.rs); headless equivalents:

    python -m yasph2d_tpu run      [--config cfg.json] [--steps N] [--backend cpu]
    python -m yasph2d_tpu record   [--config cfg.json] [--frames N] [--out DIR]
                                   [--resolution WxH]
    python -m yasph2d_tpu bench    (same as python bench.py)
    python -m yasph2d_tpu dump-config cfg.json   (write the default config)
"""

import argparse
import json
import sys
import time


def _load_config(path):
    from .config import SimulationConfig

    return SimulationConfig.from_json(path) if path else SimulationConfig()


def cmd_run(args):
    import jax

    if args.backend:
        jax.config.update("jax_platforms", args.backend)
    import numpy as np

    cfg = _load_config(args.config)
    world, solver, boundary, carry = cfg.build()
    print(f"# Dynamic Particles:  {world.num_dynamic_particles}")
    print(f"# Boundary Particles: {world.num_boundary_particles}")

    simulate = jax.jit(solver.simulate, static_argnums=2)
    t0 = time.perf_counter()
    carry, diag = simulate(carry, boundary, args.steps)
    pos = np.asarray(carry.particles.positions)
    elapsed = time.perf_counter() - t0
    print(json.dumps({
        "steps": args.steps,
        "wall_s": round(elapsed, 3),
        "simulated_s": float(carry.time.total_simulated_time),
        "dt": float(diag.dt),
        "finite": bool(np.isfinite(pos).all()),
        "neighbor_drops": int(diag.neighbor_drops),
        "density_iterations": int(diag.density_iterations),
        "divergence_iterations": int(diag.divergence_iterations),
    }))


def cmd_record(args):
    import jax

    if args.backend:
        jax.config.update("jax_platforms", args.backend)
    from .app import SimulationApp, UpdateMode

    cfg = _load_config(args.config)
    w, h = (int(v) for v in args.resolution.split("x"))
    app = SimulationApp(
        solver=cfg.solver.kind,
        world=cfg.build_world(),
        resolution=(w, h),
        update_mode=UpdateMode.RECORDING,
        recording_dir=args.out,
    )
    app.run(args.frames)
    print(f"wrote {args.frames} frames to {args.out}/")
    if app.warnings:
        print(f"warnings: {list(app.warnings)[:5]}", file=sys.stderr)


def cmd_dump_config(args):
    from .config import SimulationConfig

    SimulationConfig().to_json(args.path)
    print(f"wrote default config to {args.path}")


def main():
    parser = argparse.ArgumentParser(prog="yasph2d_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_run = sub.add_parser("run", help="run a simulation headless, print stats")
    p_run.add_argument("--config", default=None)
    p_run.add_argument("--steps", type=int, default=300)
    p_run.add_argument("--backend", default=None, help="e.g. cpu")
    p_run.set_defaults(fn=cmd_run)

    p_rec = sub.add_parser("record", help="render a PNG sequence")
    p_rec.add_argument("--config", default=None)
    p_rec.add_argument("--frames", type=int, default=60)
    p_rec.add_argument("--out", default="recording")
    p_rec.add_argument("--resolution", default="1920x1080")
    p_rec.add_argument("--backend", default=None)
    p_rec.set_defaults(fn=cmd_record)

    p_cfg = sub.add_parser("dump-config", help="write the default config JSON")
    p_cfg.add_argument("path")
    p_cfg.set_defaults(fn=cmd_dump_config)

    args = parser.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
