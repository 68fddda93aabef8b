"""Op-level time breakdown of the flagship train step (committed form of
the round-3b ad-hoc analysis, docs/ROADMAP.md "Op-profile-driven step
optimization").

Captures a jax.profiler trace of the steady-state train step and parses it
with xprof's hlo_stats converter into:

  * a per-HLO-category time split (matmul / convolution / elementwise ...),
  * the top-K individual ops by self time, each with its roofline verdict
    (`bound_by`, achieved HBM bandwidth, model FLOP rate),
  * a one-line summary: step time, % of time in MXU-bound ops, % HBM-bound.

This is how the round-3 step optimizations were found (attention-score
dtype, saved dropout masks, gather-free framing, lse slabs): the profile
names the exact fusion and the source line.

Usage (serialize with any other TPU process — never overlap two):
    python scripts/profile_step.py [--steps 5] [--top 25] [--json out.json]

Reference analogue: the repo's GPU line profiler + torch profiler usage
(/root/reference/utils.py GPU memory profiling); here the profile is
op-level XLA, the TPU-native equivalent.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _capture(steps: int, logdir: str) -> None:
    import jax

    import bench

    bench._warm()
    model, cfg, tx, state, step_cfg, batch, _ = bench._setup(
        bench._default_chunk()
    )
    from indic_cl_asr_tpu.train.step import make_train_step

    step = jax.jit(
        make_train_step(model, cfg, step_cfg, tx), donate_argnums=(0,)
    )
    # compile + reach steady state outside the trace
    state, aux = step(state, batch, jax.random.PRNGKey(0))
    float(aux["train_loss"])
    state, aux = step(state, batch, jax.random.PRNGKey(1))
    float(aux["train_loss"])

    with jax.profiler.trace(logdir):
        for i in range(steps):
            state, aux = step(state, batch, jax.random.PRNGKey(2 + i))
        float(aux["train_loss"])  # host sync inside the trace window


def _rows(logdir: str) -> list[dict]:
    from xprof.convert import raw_to_tool_data as rtd

    paths = sorted(
        glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    )
    if not paths:
        raise SystemExit(f"no .xplane.pb under {logdir}")
    data, _ = rtd.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
    table = json.loads(data)
    cols = [c["id"] for c in table["cols"]]
    out = []
    for row in table.get("rows", []):
        vals = [c.get("v") for c in row["c"]]
        out.append(dict(zip(cols, vals)))
    return out


def _summarize(rows: list[dict], top: int) -> dict:
    total = sum(r["total_self_time"] or 0.0 for r in rows)
    by_cat: dict[str, float] = {}
    by_bound: dict[str, float] = {}
    for r in rows:
        t = r["total_self_time"] or 0.0
        by_cat[r["category"]] = by_cat.get(r["category"], 0.0) + t
        by_bound[r["bound_by"] or "?"] = (
            by_bound.get(r["bound_by"] or "?", 0.0) + t
        )
    cats = sorted(by_cat.items(), key=lambda kv: -kv[1])
    ops = sorted(rows, key=lambda r: -(r["total_self_time"] or 0.0))[:top]
    return {
        "total_self_time_us": total,
        "by_category": [
            {"category": c, "us": round(t, 1), "pct": round(100 * t / total, 2)}
            for c, t in cats
        ],
        "by_bound": {
            k: round(100 * v / total, 2) for k, v in by_bound.items()
        },
        "top_ops": [
            {
                "op": r["hlo_op_name"],
                "category": r["category"],
                "us": round(r["total_self_time"] or 0.0, 1),
                "pct": round(
                    100 * (r["total_self_time"] or 0.0) / total, 2
                ),
                "occurrences": int(r["occurrences"] or 0),
                "bound_by": r["bound_by"],
                "hbm_gbps": round(r["measured_memory_bw"] or 0.0, 1),
                "gflops": round(r["model_flop_rate"] or 0.0, 1),
                "tf_op": (r["tf_op_name"] or "")[:120],
            }
            for r in ops
        ],
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--logdir", default=None, help="reuse an existing trace")
    ap.add_argument("--json", default=None, help="write full summary here")
    args = ap.parse_args()

    logdir = args.logdir
    if logdir is None or not glob.glob(
        os.path.join(logdir, "**", "*.xplane.pb"), recursive=True
    ):
        logdir = logdir or tempfile.mkdtemp(prefix="indic_asr_profile_")
        print(f"# capturing {args.steps} steps -> {logdir}", file=sys.stderr)
        _capture(args.steps, logdir)

    summary = _summarize(_rows(logdir), args.top)
    print(f"device self time: {summary['total_self_time_us'] / 1e3:.2f} ms "
          f"({args.steps} steps)")
    print("\nby HLO category:")
    for c in summary["by_category"]:
        print(f"  {c['pct']:6.2f}%  {c['us'] / 1e3:9.3f} ms  {c['category']}")
    print("\nby roofline bound:")
    for k, pct in sorted(summary["by_bound"].items(), key=lambda kv: -kv[1]):
        print(f"  {pct:6.2f}%  {k}")
    print(f"\ntop {args.top} ops by self time:")
    for o in summary["top_ops"]:
        print(
            f"  {o['pct']:5.2f}%  {o['us'] / 1e3:8.3f} ms x{o['occurrences']:<4d}"
            f" [{o['bound_by']:>7s}] {o['op']}"
            f"  (bw {o['hbm_gbps']} GB/s, {o['gflops']} GFLOP/s)"
        )
        if o["tf_op"]:
            print(f"          {o['tf_op']}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"# wrote {args.json}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
