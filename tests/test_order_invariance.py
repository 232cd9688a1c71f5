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


# r7 VERDICT #7: the full §62 class-c surface — closed-form statistics
# over exact integer moments — pinned bit-identical under repartition
# at unit speed (the jitter gate covers the same property operationally
# across the whole registry; these run in CI per commit).
from trading_etl_python_spark.operators import analytics as AN

_CLASS_C = {
    "sharpe": lambda b: AN.symbol_sharpe(b, min_days=15),
    "sortino": lambda b: AN.sortino_ratio(b, min_days=15),
    "calmar": lambda b: AN.calmar_ratio(b, min_days=15),
    "info_ratio": lambda b: AN.info_ratio(b, basket_max_symbol=50, min_days=15),
    "omega": lambda b: AN.omega_ratio(b, min_days=15),
    "vratio": lambda b: AN.variance_ratio(b, min_days=15),
    "hurst": lambda b: AN.hurst_rs(b, sizes=(4, 8, 16)),
    "garch": lambda b: AN.garch_volatility(b),
    "runs_test": lambda b: AN.runs_test(b, min_days=15),
}


def _rows(df):
    # repr round-trips doubles exactly in py3 — any accumulation-order
    # fork shows as a repr diff; sort for partition-order independence
    return sorted(repr(tuple(r)) for r in df.collect())


@pytest.mark.parametrize("k", [1, 7, 32])
@pytest.mark.parametrize("name", sorted(_CLASS_C))
def test_class_c_bit_identical_under_repartition(spark, sf_dir, name, k):
    b = bars(spark, sf_dir)
    fn = _CLASS_C[name]
    base = _rows(fn(b))
    got = _rows(fn(b.repartition(k)))
    assert base and got == base
