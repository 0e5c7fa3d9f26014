#!/usr/bin/env python3
"""Artifact-claim checker (r12 verdict item: three narrative numbers
contradicted their committed artifacts in one round).

Every numeric claim a doc makes about a committed JSON artifact is
declared in tools/claims.json as:

    {"doc": "README.md",
     "must_contain": "14.4k rows/s",          # the literal doc text
     "artifact": "BENCH_FULL_latest.json",
     "expr": "j['stream_throughput'][0]['rows_per_sec']/1000",
     "value": 14.4,                            # what expr must evaluate to
     "tol": 0.05}                              # relative tolerance

The checker fails if (a) the doc no longer contains the claimed text
(stale manifest), or (b) the artifact-derived value drifts from `value`
(stale doc).  Adding a narrative number without a manifest entry is
still possible — the review rule is: any doc sentence citing a *.json
artifact needs a claims.json row.

Usage: python3 tools/check_claims.py   (run from the repo root)
"""
import json
import math
import statistics
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def derive(artifact_path: Path, expr: str):
    with open(artifact_path) as f:
        j = json.load(f)
    # helpers available to expressions
    env = {
        "j": j,
        "median": statistics.median,
        "min": min,
        "max": max,
        "sum": sum,
        "len": len,
        "sqrt": math.sqrt,
        "round": round,
        "sorted": sorted,
        "abs": abs,
    }
    env["__builtins__"] = {}
    return eval(expr, env)  # noqa: S307 - repo-local manifest


def derive2(a1: Path, a2: Path, expr: str):
    with open(a1) as f:
        j1 = json.load(f)
    with open(a2) as f2:
        j2 = json.load(f2)
    env = {
        "j1": j1,
        "j2": j2,
        "median": statistics.median,
        "min": min,
        "sorted": sorted,
        "len": len,
        "round": round,
    }
    env["__builtins__"] = {}
    return eval(expr, env)  # noqa: S307


def main() -> int:
    manifest = json.loads((ROOT / "tools" / "claims.json").read_text())
    failures = []
    for c in manifest:
        doc_path = ROOT / c["doc"]
        doc = doc_path.read_text()
        tag = f"{c['doc']} :: {c['must_contain'][:60]!r}"
        if c["must_contain"] not in doc:
            failures.append(f"STALE-MANIFEST {tag}: text not found in doc")
            continue
        try:
            if "artifact2" in c:
                got = derive2(ROOT / c["artifact"], ROOT / c["artifact2"], c["expr"])
            else:
                got = derive(ROOT / c["artifact"], c["expr"])
        except Exception as e:  # noqa: BLE001
            failures.append(f"EXPR-ERROR {tag}: {e}")
            continue
        want = c["value"]
        tol = c.get("tol", 0.005)
        try:
            ok = (
                str(got) == want
                if isinstance(want, str)
                else abs(got - want) <= abs(want) * tol + 1e-12
            )
        except TypeError:
            # shape drift (expr now yields None / a tuple where a number
            # was claimed) is itself a stale-doc signal, not a crash
            ok = False
        if not ok:
            failures.append(
                f"STALE-DOC {tag}: artifact-derived {got!r} != claimed {want!r}"
            )
        else:
            print(f"OK  {tag}: {got!r}")
    if failures:
        print("\n".join(failures), file=sys.stderr)
        print(f"\n{len(failures)} claim(s) FAILED of {len(manifest)}", file=sys.stderr)
        return 1
    print(f"\nall {len(manifest)} artifact claims verified")
    return 0


if __name__ == "__main__":
    sys.exit(main())
