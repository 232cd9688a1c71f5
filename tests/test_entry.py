"""Driver-contract smoke: entry/queries/oracle_sql shape invariants."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert len(df.columns) == 20
    assert df.count() > 0


def test_every_oracle_has_a_query():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 40


def test_queries_run_and_align_columns(spark, sf_dir):
    """Each query returns rows at sf0.001; every oracle references only
    aliased output columns (checked fully by tools/check_correctness.py —
    here we just guard the contract shape cheaply on a sample."""
    qs = entrymod.queries()
    for name in ("q_sma", "q_join_agg", "q_text_tokens"):
        df = qs[name](spark, sf_dir)
        assert df.count() > 0, name
