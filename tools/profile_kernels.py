"""Kernel-level accounting of a `--profile-dir` capture (round-4 verdict
next-step #6): parse the xplane.pb with xprof's converter and print the
top-N HLO ops by total self time, plus a per-category rollup.

Usage:
    python main.py ... --profile-dir /tmp/xprof  # capture one steady epoch
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python tools/profile_kernels.py /tmp/xprof [--top 15]

(The pure-python protobuf env var works around the image's protoc-version
mismatch in the bundled xprof protos.)
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def find_xplane(root: str) -> str:
    hits = sorted(glob.glob(os.path.join(root, "**", "*.xplane.pb"),
                            recursive=True))
    if not hits:
        sys.exit(f"no .xplane.pb under {root}")
    return hits[-1]


def load_hlo_stats(xplane: str):
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data([xplane], "hlo_stats",
                                                   params={})
    d = json.loads(data if isinstance(data, str) else data.decode())
    cols = [c["label"] for c in d["cols"]]
    rows = [dict(zip(cols, (c.get("v") for c in r["c"]))) for r in d["rows"]]
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("profile_dir")
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--json", action="store_true", help="machine output")
    args = ap.parse_args(argv)

    rows = load_hlo_stats(find_xplane(args.profile_dir))
    total_us = sum(r["Total self time (us)"] for r in rows)

    by_cat: dict[str, float] = {}
    for r in rows:
        by_cat[r["HLO op category"]] = (
            by_cat.get(r["HLO op category"], 0.0) + r["Total self time (us)"]
        )

    top = sorted(rows, key=lambda r: -r["Total self time (us)"])[: args.top]
    if args.json:
        print(json.dumps({
            "total_self_us": total_us,
            "by_category": dict(sorted(by_cat.items(), key=lambda kv: -kv[1])),
            "top": [{k: r[k] for k in (
                "HLO op name", "HLO op category", "#Occurrences",
                "Avg. self time (us)", "Total self time (us)",
                "Total self time (%)", "Bound by")} for r in top],
        }, indent=1))
        return

    print(f"total device self time: {total_us/1e3:.1f} ms over {len(rows)} ops")
    print("\n-- by category --")
    for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:<28} {us/1e3:9.2f} ms  {100*us/total_us:5.1f}%")
    print(f"\n-- top {args.top} ops by total self time --")
    hdr = f"  {'op':<46} {'cat':<16} {'n':>6} {'avg us':>9} {'total ms':>9} {'%':>6}  bound"
    print(hdr)
    for r in top:
        print(f"  {r['HLO op name'][:46]:<46} {r['HLO op category'][:16]:<16} "
              f"{r['#Occurrences']:>6} {r['Avg. self time (us)']:>9.1f} "
              f"{r['Total self time (us)']/1e3:>9.2f} "
              f"{r['Total self time (%)']:>6.2f}  {r.get('Bound by') or ''}")


if __name__ == "__main__":
    main()
