"""Round-7 order-invariance property tests (r6 VERDICT items 1-2).

Judged statistics rebuilt on exact integer moments must be BIT-identical
under any input partitioning: the q_spearman / q_dsir_weights driver
flakes passed every local gate but failed the driver, because the
driver's different partition splits changed float accumulation order and
forked a ROUND(<float-agg>) boundary.  These tests re-run each operator
over repartition(k) for k in {1, 7, 32} and require exact (==, not
approx) equality with the unrepartitioned result — the local test that
WOULD have caught both r6 reds.
"""

import pytest

from trading_etl_python_spark.operators.analytics import basket_spearman
from trading_etl_python_spark.operators.curation import dsir_weights
from trading_etl_python_spark.sources.tables import bars, load_table


def _spearman_map(df):
    return {
        (r.symbol_a, r.symbol_b): (r.n_days, r.spearman)
        for r in basket_spearman(df, basket_max_symbol=50).collect()
    }


@pytest.mark.parametrize("k", [1, 7, 32])
def test_spearman_bit_identical_under_repartition(spark, sf_dir, k):
    b = bars(spark, sf_dir)
    base = _spearman_map(b)
    got = _spearman_map(b.repartition(k))
    assert base and got == base


def _dsir_map(df):
    return {
        r.doc_id: (r.n_tokens, r.avg_logratio)
        for r in dsir_weights(df, target_lang="en").collect()
    }


@pytest.mark.parametrize("k", [1, 7, 32])
def test_dsir_bit_identical_under_repartition(spark, sf_dir, k):
    docs = load_table(spark, sf_dir, "documents")
    base = _dsir_map(docs)
    got = _dsir_map(docs.repartition(k))
    assert base and got == base
