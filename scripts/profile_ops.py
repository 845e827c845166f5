"""Top individual HLO ops of the scanned MD step (xplane -> hlo_stats),
with occurrence counts -- finer-grained than profile_sources.py when
fusion-level attribution is needed.  Usage:
    python scripts/profile_ops.py [n_water] [pme_grid] [evb_max_states] [chunk]
"""

import glob
import json
import re
import sys
import tempfile
import pathlib

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
    if "--cols" in sys.argv:
        print(list(cols))
    self_col = next(v for k, v in cols.items()
                    if "self" in k.lower() and "us" in k.lower())
    cat_col = cols.get("HLO op category")
    occ_col = cols.get("#Occurrences")
    name_col = next((v for k, v in cols.items()
                     if "hlo op name" in k.lower()
                     or k.lower() == "hlo op"), None)
    expr_col = cols.get("HLO op text")
    src_col = next((v for k, v in cols.items() if "source" in k.lower()),
                   None)

    rows = []
    total = 0.0
    for row in tbl["rows"]:
        c = row["c"]
        v = c[self_col].get("v") or 0.0
        total += v
        name = (c[name_col].get("v") if name_col is not None else "?") or "?"
        cat = (c[cat_col].get("v") if cat_col is not None else "?") or "?"
        occ = (c[occ_col].get("v") if occ_col is not None else 0) or 0
        src = (c[src_col].get("v") if src_col is not None else "") or ""
        src = re.sub(r"<[^>]*>", "", str(src))
        src = src.replace("/root/repo/reactive_pb_nn_md_tpu/", "")
        expr = (c[expr_col].get("v") if expr_col is not None else "") or ""
        expr = re.sub(r"<[^>]*>", "", str(expr))[:110]
        rows.append((v, name, cat, occ, src, expr))

    rows.sort(key=lambda r: -r[0])
    print(f"# atoms={system.n_atoms} chunk={chunk} "
          f"total_self={total / 1000:.3f} ms "
          f"({total / 1000 / chunk:.3f} ms/step)")
    n_ops = sum(int(r[3]) for r in rows) / chunk
    print(f"# ~{n_ops:.0f} op executions/step across {len(rows)} distinct ops")
    for v, name, cat, occ, src, expr in rows[:40]:
        print(f"{v / chunk:8.1f} us/step x{int(occ):5d}  [{cat}] {name}  "
              f"{src}")
        if expr:
            print(f"          {expr}")


if __name__ == "__main__":
    main()
