"""Top device self-time sources of the scanned MD step (xplane trace ->
hlo_stats, aggregated by source location).  Usage:
    python scripts/profile_sources.py [n_water] [pme_grid] [evb_max_states] [chunk]

chunk should match an already-compiled scan length (bench.py uses 40 for
the flagship and 4 for the 10k config) to hit the persistent compile
cache -- a cold compile of a new chunk length takes ~25 min over a
degraded tunnel."""

import glob
import json
import sys
import tempfile
import pathlib
from collections import defaultdict

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tests"))


def main():
    import jax
    import __graft_entry__ as g
    g._enable_compile_cache()
    from reactive_pb_nn_md_tpu.md import integrators

    n_water = int(sys.argv[1]) if len(sys.argv) > 1 else 215
    pme_grid = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    smax = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    chunk = int(sys.argv[4]) if len(sys.argv) > 4 else 40

    system, cbw, cfg, ms = g._build(n_water=n_water, pme_grid=pme_grid,
                                    precision="fp32", evb_max_states=smax)

    def scan(ms):
        return integrators.md_scan(ms, system, cbw, cfg.delta_t, "NVE",
                                   chunk)

    ms, diag = scan(ms)
    float(diag.potential[-1])          # warm

    d = tempfile.mkdtemp()
    with jax.profiler.trace(d):
        ms, diag = scan(ms)
        float(diag.potential[-1])

    xp = glob.glob(d + "/**/*.xplane.pb", recursive=True)
    from xprof.convert import raw_to_tool_data as r2t
    data, _ = r2t.xspace_to_tool_data([xp[0]], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    tbl = json.loads(data)
    cols = {c["label"]: k for k, c in enumerate(tbl["cols"])}
    self_col = next(v for k, v in cols.items()
                    if "self" in k.lower() and "us" in k.lower())
    cat_col = cols.get("HLO op category")
    src_col = next((v for k, v in cols.items() if "source" in k.lower()),
                   None)
    occ_col = cols.get("#Occurrences")

    by_src = defaultdict(float)
    by_cat = defaultdict(float)
    total = 0.0
    for row in tbl["rows"]:
        c = row["c"]
        v = c[self_col].get("v") or 0.0
        total += v
        src = (c[src_col].get("v") if src_col is not None else "") or "?"
        cat = (c[cat_col].get("v") if cat_col is not None else "") or "?"
        by_src[src] += v
        by_cat[cat] += v

    print(f"# atoms={system.n_atoms} chunk={chunk} "
          f"total_self={total / 1000:.3f} ms "
          f"({total / 1000 / chunk:.3f} ms/step)")
    print("## by category")
    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1])[:12]:
        print(f"{v / chunk:9.1f} us/step  {k}")
    print("## by source")
    for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:28]:
        print(f"{v / chunk:9.1f} us/step  {k}")


if __name__ == "__main__":
    main()
