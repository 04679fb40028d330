"""Every registry query with an oracle must hash-match DuckDB at
sf0.001 — the local mirror of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import REGISTRY
from tests.conftest import SF_SMALL
from tests.oracle_harness import compare, duck_connection

WITH_ORACLE = [n for n, s in REGISTRY.items() if s.oracle is not None]


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMALL)
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_SMALL)
    ddf = duck.sql(spec.oracle).df()
    compare(sdf, ddf, name)


def test_all_queries_return_rows(spark):
    # Redundancy cut (r12): every oracled query is already EXECUTED at
    # SF_SMALL by its test_query_matches_oracle[...] parameter above —
    # re-running all 393 here made this the suite's single most
    # expensive test (405.7 s of the 43-min wall, measured
    # --durations) while adding coverage only for the rows-only
    # names.  Sweep exactly those.
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            assert spec.fn(spark, SF_SMALL).count() >= 0, name


# Queries whose oracle legitimately returns zero rows on this
# synthetic corpus (semantics preserved from their spec; an oracle
# pass on them is rows==0 both sides, which IS the correct answer).
_KNOWN_EMPTY_ORACLES = {
    # TPC-H Q22: no customer clears the above-average-balance +
    # seven-year-dormancy double filter on the synthetic orders
    "q22_dormant_accounts",
}


def test_oracles_are_not_vacuously_empty(duck):
    """A 0-row oracle makes the value-hash check pass without testing
    anything (the b36/c62/c106/c25 lesson, four separate times) —
    every oracle must produce rows at sf0.001 unless it is on the
    documented-empty allowlist.  DuckDB-only, so the whole registry
    sweeps in seconds."""
    empty = []
    for name, spec in REGISTRY.items():
        if spec.oracle is None or name in _KNOWN_EMPTY_ORACLES:
            continue
        if len(duck.sql(spec.oracle).df()) == 0:
            empty.append(name)
    assert not empty, f"vacuously-empty oracles: {empty}"


def test_entry_smoke(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_c64b_sketch_matrix_tracks_exact_c64(spark, duck):
    """The KMV-sketched source-overlap matrix must agree with the
    exact inverted-index Jaccard within sketch tolerance (k=256 ->
    ~6% std on retained-fraction estimates; the fixture Jaccards are
    2-4%, so absolute ppm slack is the meaningful bound)."""
    exact = {(r[0], r[1]): r[2] for r in duck.sql("""
        WITH t AS (SELECT source,
                          string_split_regex(trim(lower(text)), ' +')
                            AS toks
                   FROM documents),
        sh AS (SELECT DISTINCT source,
                      unnest(list_distinct(list_transform(
                        range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' '
                             || toks[i+2]))) AS sh
               FROM t),
        sizes AS (SELECT source, count(*) AS n_sh FROM sh
                  GROUP BY source),
        common AS (SELECT a.source s1, b.source s2, count(*) n
                   FROM sh a JOIN sh b
                     ON a.sh = b.sh AND a.source < b.source
                   GROUP BY 1, 2)
        SELECT s1, s2, n * 1000000 // (x.n_sh + y.n_sh - n)
        FROM common JOIN sizes x ON x.source = s1
                    JOIN sizes y ON y.source = s2""").fetchall()}
    got = {(r["src1"], r["src2"]): r["jaccard_est_ppm"] for r in
           REGISTRY["c64b_source_overlap_sketched"]
           .fn(spark, SF_SMALL).collect()}
    assert exact and set(exact) <= set(got)
    diffs = sorted(abs(got[k] - e) for k, e in exact.items())
    assert diffs[-1] <= 30_000, f"max drift {diffs[-1]} ppm"
    assert diffs[int(len(diffs) * 0.9)] <= 15_000
