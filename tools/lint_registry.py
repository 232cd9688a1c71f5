"""Registry/docs consistency lint: every registry query must appear in
COVERAGE.md, every COVERAGE.md q_-mention must exist in the registry,
and the advertised counts must match reality.  Run in CI-style before a
round closes; exits non-zero on drift."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from trading_etl_python_spark.suite import ORACLES, QUERIES, TIERS

    cov = open(os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md")).read()
    mentioned = set(re.findall(r"\bq_[a-z0-9_]+\b", cov))
    registry = set(QUERIES)
    # family rows may use brace ranges (q_sql_tpch_q{1..22}) — a
    # mention that is a proper prefix of a registry name covers it
    def documented(q: str) -> bool:
        return q in mentioned or any(
            q.startswith(m) and len(m) >= 10 for m in mentioned
        )

    missing_doc = sorted(q for q in registry if not documented(q))
    ghost_doc = sorted(
        m for m in mentioned
        if m not in registry and not any(q.startswith(m) for q in registry)
    )
    bad = False
    if missing_doc:
        print(f"NOT IN COVERAGE.md ({len(missing_doc)}): {missing_doc}")
        bad = True
    if ghost_doc:
        print(f"IN COVERAGE.md BUT NOT REGISTRY ({len(ghost_doc)}): {ghost_doc}")
        bad = True
    if len(QUERIES) != len(ORACLES):
        print(f"queries {len(QUERIES)} != oracles {len(ORACLES)}")
        bad = True
    # every entry must carry a valid tier (r8 VERDICT #4)
    no_tier = sorted(q for q in registry if q not in TIERS)
    bad_tier = sorted(
        q for q, t in TIERS.items()
        if t not in ("production", "measurement", "demo")
    )
    if no_tier:
        print(f"NO TIER ({len(no_tier)}): {no_tier}")
        bad = True
    if bad_tier:
        print(f"INVALID TIER: {bad_tier}")
        bad = True
    counts = {t: sum(1 for v in TIERS.values() if v == t)
              for t in ("production", "measurement", "demo")}
    print("tiers: " + ", ".join(f"{n} {t}" for t, n in counts.items()))
    m = re.search(r"Registry as of r\d+: (\d+) queries / (\d+)", cov)
    if m and (int(m.group(1)) != len(QUERIES) or int(m.group(2)) != len(ORACLES)):
        print(f"COVERAGE.md count {m.groups()} != actual {len(QUERIES)}")
        bad = True
    print(f"{len(registry)} registry, {len(mentioned)} documented, drift={'YES' if bad else 'no'}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
