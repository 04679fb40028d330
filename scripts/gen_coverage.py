"""Regenerate COVERAGE.md from the query registry.

Usage: python scripts/gen_coverage.py  (from the repo root)
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import REGISTRY  # noqa: E402

HEADER = """# COVERAGE — SURVEY §2 operator inventory → engine surface

Machine-generated from the query registry (`plans/driver_queries*.py`);
regenerate with `python scripts/gen_coverage.py`.  Every row below is a
`queries()` entry the driver cross-checks against DuckDB at sf0.01
("oracle" column; `rows-only` = non-SQL-expressible, weaker check).

## Query registry ({n} entries)

| query id | oracle | covers |
|---|---|---|"""

STATIC_TAIL = pathlib.Path(__file__).resolve().parent.parent / "COVERAGE.md"


def main() -> None:
    existing = STATIC_TAIL.read_text().split("\n## Non-query surface", 1)
    tail = ("\n## Non-query surface" + existing[1]) if len(existing) == 2 else ""
    lines = [HEADER.format(n=len(REGISTRY))]
    for name, spec in REGISTRY.items():
        oracle = "value-hash" if spec.oracle else "rows-only"
        lines.append(f"| `{name}` | {oracle} | {spec.note} |")
    STATIC_TAIL.write_text("\n".join(lines) + "\n" + tail)
    print(f"wrote COVERAGE.md with {len(REGISTRY)} registry rows")


if __name__ == "__main__":
    main()
