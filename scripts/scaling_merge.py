"""Min-merge several scaling_check JSON outputs into one SCALING.md.

Host co-tenancy noise is additive and intermittent: one burst landing
on a single-shot ×16 leg fabricates a super-linear exponent (observed:
chunk_pack 0.5 s → 15.3 s, fitted 2.39, same code same data minutes
apart). scaling_check supports SPARK_GRAFT_SCALE_RUNS for in-process
min-of-N, but one process then outlives this environment's task
timeout — so the robust protocol is N independent full runs min-merged
here (same estimator: per-kernel, per-replication minimum).

Usage: python scripts/scaling_merge.py out1.json out2.json [...]
       SCALING_MD=SCALING.md python scripts/scaling_merge.py ...
Each input is a scaling_check stdout capture; the LAST line starting
with '{"sf_dir"' is taken from each. All inputs must be from the same
code revision — a min over different kernels is meaningless.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.scaling_check import fit_exponent, write_md  # noqa: E402


def load(path: str) -> dict:
    last = None
    for ln in open(path, encoding="utf-8"):
        if ln.strip().startswith('{"sf_dir"'):
            last = json.loads(ln)
    if last is None:
        raise SystemExit(f"{path}: no scaling JSON line found")
    return last


def main() -> None:
    runs = [load(p) for p in sys.argv[1:]]
    if len(runs) < 2:
        raise SystemExit("need >= 2 scaling_check outputs to merge")
    base = runs[0]
    merged: dict[str, dict[str, float]] = {}
    for r in runs:
        # ADVICE r10: min-merging runs from a different corpus or a
        # different code revision (kernel set drift) silently produces
        # a SCALING.md that mixes incomparable measurements — fail
        # loudly instead.
        assert r["replications"] == base["replications"], "replication mismatch"
        assert r["sf_dir"] == base["sf_dir"], (
            f"sf_dir mismatch: {r['sf_dir']} != {base['sf_dir']} — "
            "runs measured different corpora"
        )
        assert set(r["seconds"]) == set(base["seconds"]), (
            "kernel-set mismatch (stale-revision capture?): "
            f"{sorted(set(r['seconds']) ^ set(base['seconds']))}"
        )
        for k, pts in r["seconds"].items():
            for n, t in pts.items():
                cur = merged.setdefault(k, {})
                cur[n] = min(cur.get(n, float("inf")), t)
    exponents = {
        k: round(fit_exponent({int(n): t for n, t in pts.items()}), 2)
        for k, pts in merged.items()
    }
    out = {
        "sf_dir": base["sf_dir"],
        "replications": base["replications"],
        "merged_from": len(runs),
        "seconds": merged,
        "exponents": exponents,
    }
    print(json.dumps(out), flush=True)
    md_path = os.environ.get("SCALING_MD")
    if md_path:
        write_md(md_path, out)


if __name__ == "__main__":
    main()
