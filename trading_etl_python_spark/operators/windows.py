"""Window-native technical indicators (SURVEY.md §2.1 W1, W5, W7, W9-W14).

The reference computes these with pandas-ta over a per-symbol pandas frame
(/root/reference/trading-etl-python/src/db/backfill.py:12-64 and
src/processing/consumer.py:82-135).  Here each is a fixed-frame window
aggregate over ``Window.partitionBy("symbol").orderBy("time", "event_id")``
— pure JVM expressions, shuffle-once-per-key, codegen'd, and
cluster-scalable (state never exceeds the frame, exactly like the
reference's 60-row cap at consumer.py:33).

Numeric-parity conventions shared with the DuckDB oracles:
- within-key order is always (time, event_id) — fully deterministic
- warmup gates are explicit ``count() >= n`` guards (pandas min_periods)
- float outputs are rounded to 4 decimals to absorb summation-order
  differences between engines (window aggregation trees differ)
- every division guards the denominator with ``nullif``-style logic
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

ROUND_DP = 4


def by_key(symbol: str = "symbol", time: str = "time", tiebreak: str = "event_id") -> WindowSpec:
    return Window.partitionBy(symbol).orderBy(F.col(time).asc(), F.col(tiebreak).asc())


def _guarded(expr: Column, cnt: Column, n: int, dp: int = ROUND_DP) -> Column:
    return F.when(cnt >= n, F.round(expr, dp))


def with_sma(df: DataFrame, n: int = 20, col: str = "close", out: str | None = None) -> DataFrame:
    """W1 — rolling mean of last n closes, NULL until n rows exist
    (pandas-ta sma min_periods semantics; golden test
    tests/test_processing_indicators.py:28-34 in the reference)."""
    w = by_key().rowsBetween(-(n - 1), 0)
    out = out or f"sma_{n}"
    return df.withColumn(out, _guarded(F.avg(col).over(w), F.count(col).over(w), n))


def with_bbands(df: DataFrame, n: int = 20, ndev: float = 2.0) -> DataFrame:
    """W5 — Bollinger Bands: mid = SMA(n); upper/lower = mid ± ndev *
    rolling sample stddev (ddof=1, pandas default) (backfill.py:30-36)."""
    w = by_key().rowsBetween(-(n - 1), 0)
    cnt = F.count("close").over(w)
    mid = F.avg("close").over(w)
    sd = F.stddev_samp("close").over(w)
    return (
        df.withColumn("bb_mid", _guarded(mid, cnt, n))
        .withColumn("bb_upper", _guarded(mid + ndev * sd, cnt, n))
        .withColumn("bb_lower", _guarded(mid - ndev * sd, cnt, n))
    )


def with_stoch(df: DataFrame, n: int = 14, smooth_k: int = 3) -> DataFrame:
    """W7 — Stochastic %K(14,3): raw %K = 100*(close-min(low,n)) /
    (max(high,n)-min(low,n)), then SMA(smooth_k) (backfill.py:46-53; the
    reference keeps only the %K column)."""
    w = by_key().rowsBetween(-(n - 1), 0)
    cnt = F.count("close").over(w)
    denom = F.max("high").over(w) - F.min("low").over(w)
    raw = F.lit(100.0) * (F.col("close") - F.min("low").over(w)) / F.nullif(denom, F.lit(0.0))
    df = df.withColumn("_stoch_raw", F.when(cnt >= n, raw))
    wk = by_key().rowsBetween(-(smooth_k - 1), 0)
    k = _guarded(F.avg("_stoch_raw").over(wk), F.count("_stoch_raw").over(wk), smooth_k)
    return df.withColumn(f"stoch_k_{n}", k).drop("_stoch_raw")


def with_mfi(df: DataFrame, n: int = 14) -> DataFrame:
    """W9 — Money Flow Index: typical price tp=(h+l+c)/3, raw money flow
    tp*volume signed by the tp delta; MFI = 100*possum/(possum+negsum)
    over the last n deltas (backfill.py:58-60)."""
    kw = by_key()
    tp = (F.col("high") + F.col("low") + F.col("close")) / F.lit(3.0)
    df = df.withColumn("_tp", tp).withColumn("_tp_prev", F.lag("_tp").over(kw))
    mf = F.col("_tp") * F.col("volume")
    pos = F.when(F.col("_tp") > F.col("_tp_prev"), mf).otherwise(F.lit(0.0))
    neg = F.when(F.col("_tp") < F.col("_tp_prev"), mf).otherwise(F.lit(0.0))
    df = df.withColumn("_pos", F.when(F.col("_tp_prev").isNotNull(), pos)).withColumn(
        "_neg", F.when(F.col("_tp_prev").isNotNull(), neg)
    )
    w = by_key().rowsBetween(-(n - 1), 0)
    cnt = F.count("_pos").over(w)  # counts non-null deltas in frame
    possum, negsum = F.sum("_pos").over(w), F.sum("_neg").over(w)
    mfi = F.lit(100.0) * possum / F.nullif(possum + negsum, F.lit(0.0))
    return df.withColumn(f"mfi_{n}", _guarded(mfi, cnt, n)).drop("_tp", "_tp_prev", "_pos", "_neg")


def with_obv(df: DataFrame) -> DataFrame:
    """W10 — On-Balance Volume: running Σ sign(close-prev_close)*volume
    (backfill.py:61).  Integer arithmetic — exact, no rounding needed."""
    kw = by_key()
    prev = F.lag("close").over(kw)
    signed = (
        F.when(prev.isNull(), F.lit(0))
        .when(F.col("close") > prev, F.col("volume"))
        .when(F.col("close") < prev, -F.col("volume"))
        .otherwise(F.lit(0))
    )
    w = by_key().rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn("_sv", signed).withColumn(
        "obv", F.sum("_sv").over(w).cast("long")
    ).drop("_sv")


def with_vwap(df: DataFrame) -> DataFrame:
    """W11 — daily-anchored VWAP: cumulative Σ(tp*vol)/Σ(vol) resetting
    each calendar day (pandas-ta anchor="D"; backfill.py:62).  The day
    anchor is an extra partition key — the easy-to-miss detail from
    SURVEY.md §7.4."""
    day_w = (
        Window.partitionBy("symbol", F.to_date("time"))
        .orderBy(F.col("time").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tp = (F.col("high") + F.col("low") + F.col("close")) / F.lit(3.0)
    # Quantize tp to integer micro-units: the cumulative sums become exact
    # integer arithmetic — identical in any summation order (cross-engine
    # parity) and cheaper than float accumulation at scale.
    tpq = F.round(tp * F.lit(1000000.0), 0).cast("long")
    num = F.sum(tpq * F.col("volume")).over(day_w).cast("double")
    den = F.lit(1000000.0) * F.sum("volume").over(day_w).cast("double")
    return df.withColumn("vwap", F.round(num / F.nullif(den, F.lit(0.0)), ROUND_DP))


def with_warmup_gate(df: DataFrame, min_rows: int = 26, require_col: str | None = "sma_20") -> DataFrame:
    """W12 — emit rows only once >= min_rows of per-key history exist AND
    the slowest indicator is non-NULL (consumer.py:165-167,171-173; the
    30-msgs->5-inserts scenario in tests/test_consumer.py:136-138)."""
    w = by_key().rowsBetween(Window.unboundedPreceding, 0)
    df = df.withColumn("_hist", F.count(F.lit(1)).over(w))
    cond = F.col("_hist") >= min_rows
    if require_col is not None:
        cond = cond & F.col(require_col).isNotNull()
    return df.filter(cond).drop("_hist")


def latest_per_key(
    df: DataFrame, key: str = "symbol", order_cols: tuple[str, ...] = ("time", "event_id")
) -> DataFrame:
    """W13 — most recent row per symbol (consumer.py:135 ``df.iloc[-1]``;
    the planned /latest_price endpoint, roadmap.md:44).  max_by on a
    packed ordering key: one partial-aggregating shuffle, no full sort —
    at scale this beats the row_number() formulation because the
    map-side combine collapses each partition to one row per key."""
    ord_key = F.struct(*[F.col(c) for c in order_cols])
    agg = [F.max_by(F.col(c), ord_key).alias(c) for c in df.columns if c != key]
    return df.groupBy(key).agg(*agg)


def lookback_trim(df: DataFrame, n: int = 60) -> DataFrame:
    """W14 — keep only the last n rows per key (the reference's bounded
    state, consumer.py:33,162-163)."""
    w = Window.partitionBy("symbol").orderBy(F.col("time").desc(), F.col("event_id").desc())
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= n).drop("_rn")


def time_range(df: DataFrame, lo: str, hi: str, col: str = "time") -> DataFrame:
    """A3 — historical range query (the planned /indicators endpoint,
    roadmap.md:44-46).  On date-partitioned storage this prunes
    partitions; on raw parquet the predicate pushes to the scan."""
    return df.filter(F.col(col).between(F.lit(lo).cast("timestamp_ntz"), F.lit(hi).cast("timestamp_ntz")))


def with_wma(df: DataFrame, n: int = 10, col: str = "close", out: str | None = None) -> DataFrame:
    """WMA(n) — linearly-weighted moving average (pandas-ta wma family):
    sum(i * x_i, i=1..n, most-recent weight n) / (n*(n+1)/2), NULL until
    n rows exist.

    Implementation is the bounded collect_list + ``aggregate()`` HOF
    pattern (SURVEY.md §7.3): the frame is a fixed n rows, so the
    collected list is O(n) per row regardless of history length, and the
    whole expression stays JVM-side (no Python, Catalyst-visible) with a
    deterministic left-to-right fold for oracle parity."""
    w = by_key().rowsBetween(-(n - 1), 0)
    out = out or f"wma_{n}"
    lst = F.collect_list(col).over(w)
    weighted = F.aggregate(
        F.zip_with(lst, F.sequence(F.lit(1), F.lit(n)), lambda x, i: x * i.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    denom = float(n * (n + 1) / 2)
    return df.withColumn(out, _guarded(weighted / F.lit(denom), F.count(col).over(w), n))


def with_rolling_median(df: DataFrame, n: int = 20, col: str = "close", out: str | None = None) -> DataFrame:
    """Rolling median over the last ``n`` rows per key (robust smoother —
    no reference counterpart; the window-family complement to SMA/WMA).

    Bounded collect_list + array_sort + interpolated middle (same
    semantics as SQL ``quantile_cont(0.5)`` / DuckDB windowed
    ``median``): odd count -> middle element, even -> mean of the two
    middles, computed over the partial frame during warmup exactly like
    the SQL window aggregate.  O(n log n) per row JVM-side; the frame
    bound keeps state O(n) regardless of history (SURVEY.md §7.0)."""
    w = by_key().rowsBetween(-(n - 1), 0)
    out = out or f"median_{n}"
    arr = F.array_sort(F.collect_list(F.col(col).cast("double")).over(w))
    m = F.size(arr)
    mid_hi = F.element_at(arr, (m.cast("long") / 2 + 1).cast("int"))
    mid_lo = F.element_at(arr, (m.cast("long") / 2).cast("int"))
    med = F.when(m % 2 == 1, F.element_at(arr, ((m + 1).cast("long") / 2).cast("int"))).otherwise(
        (mid_lo + mid_hi) / 2.0
    )
    return df.withColumn(out, F.round(med, ROUND_DP))


def with_roc(df: DataFrame, n: int = 10, col: str = "close", out: str | None = None) -> DataFrame:
    """ROC(n) — rate of change: 100 * (close - close[n back]) / close[n
    back] (pandas-ta roc family; beyond the reference's 13, same window
    spec).  NULL through warmup via the LAG null, zero-guard via NULLIF."""
    prev = F.lag(col, n).over(by_key())
    expr = (F.lit(100.0) * (F.col(col) - prev)) / F.nullif(prev, F.lit(0.0))
    return df.withColumn(out or f"roc_{n}", F.round(expr, ROUND_DP))


def with_donchian(df: DataFrame, n: int = 20) -> DataFrame:
    """Donchian channel(n): upper = rolling max(high), lower = rolling
    min(low), mid = their mean — warmup-gated like every other bounded
    window indicator."""
    w = by_key().rowsBetween(-(n - 1), 0)
    cnt = F.count("close").over(w)
    u, lo = F.max("high").over(w), F.min("low").over(w)
    return (
        df.withColumn("dc_upper", _guarded(u, cnt, n))
        .withColumn("dc_lower", _guarded(lo, cnt, n))
        .withColumn("dc_mid", _guarded((u + lo) / F.lit(2.0), cnt, n))
    )


def with_willr(df: DataFrame, n: int = 14, out: str | None = None) -> DataFrame:
    """Williams %R(n): -100 * (HH - close) / (HH - LL) over the last n
    rows (pandas-ta willr family; same window spec as stoch — %R is the
    inverted un-smoothed stochastic).  Single subtraction/division over
    exact window extremes, so no accumulation-order hazard; NULLIF'd
    denominator, warmup-gated at n."""
    out = out or f"willr_{n}"
    w = by_key().rowsBetween(-(n - 1), 0)
    cnt = F.count("close").over(w)
    hh, ll = F.max("high").over(w), F.min("low").over(w)
    expr = F.lit(-100.0) * (hh - F.col("close")) / F.nullif(hh - ll, F.lit(0.0))
    return df.withColumn(out, _guarded(expr, cnt, n))


def _mfv_quant(df: DataFrame) -> DataFrame:
    """Money-flow volume quantized to integer micro-units: mfm =
    ((close-low)-(high-close))/(high-low) rounded half-up at 6dp, times
    volume — an exact BIGINT per row, so every downstream window / running
    sum is integer arithmetic, identical in any summation order (the VWAP
    quantization pattern; |mfm|<=1 and volume<=1e3 keep it far from
    overflow)."""
    mfm = (F.lit(2.0) * F.col("close") - F.col("high") - F.col("low")) / F.nullif(
        F.col("high") - F.col("low"), F.lit(0.0)
    )
    return df.withColumn(
        "_mfvq", (F.round(mfm * F.lit(1000000.0), 0).cast("long") * F.col("volume"))
    )


def with_cmf(df: DataFrame, n: int = 20, out: str | None = None) -> DataFrame:
    """Chaikin Money Flow(n): sum(money-flow volume, n) / sum(volume, n).
    Money-flow volume is quantized to integer micro-units (``_mfv_quant``)
    so both window sums are exact integers — cross-engine parity without
    trusting float window-sum accumulation order.  Rows with high==low
    contribute NULL mfv (skipped by SUM on both engines) but their volume
    still counts in the denominator, the standard CMF convention."""
    out = out or f"cmf_{n}"
    w = by_key().rowsBetween(-(n - 1), 0)
    df = _mfv_quant(df)
    cnt = F.count("close").over(w)
    num = F.sum("_mfvq").over(w).cast("double")
    den = F.lit(1000000.0) * F.sum("volume").over(w).cast("double")
    return df.withColumn(out, _guarded(num / F.nullif(den, F.lit(0.0)), cnt, n)).drop(
        "_mfvq"
    )


def with_ad_line(df: DataFrame, out: str = "ad_line") -> DataFrame:
    """Accumulation/Distribution line: running Σ of money-flow volume
    from the start of each key's history.  The cumulative sum runs over
    quantized integer micro-units (``_mfv_quant``) — exact at any depth,
    so the unbounded running frame is parity-safe where a float cumsum
    would drift by summation order.  high==low rows contribute 0.

    No re-rounding on the way out: the running total is an exact
    integer, so ``cum / 1e6`` is the same IEEE division on both engines
    (bit-identical) — while ROUND-to-4dp of that quotient is NOT parity
    -safe (a true .xxxx5 half sits within 1 ulp of the double, and the
    engines disagree on which side it falls)."""
    w = by_key().rowsBetween(Window.unboundedPreceding, 0)
    df = _mfv_quant(df).withColumn("_mfvq0", F.coalesce(F.col("_mfvq"), F.lit(0)))
    ad = F.sum("_mfvq0").over(w).cast("double") / F.lit(1000000.0)
    return df.withColumn(out, ad).drop("_mfvq", "_mfvq0")


def with_ultimate(
    df: DataFrame, n1: int = 7, n2: int = 14, n3: int = 28, out: str | None = None
) -> DataFrame:
    """Ultimate Oscillator(n1,n2,n3): buying pressure bp = close -
    min(low, prev_close), true range tr = max(high, prev_close) -
    min(low, prev_close); average ratio a_k = Σbp/Σtr over each horizon;
    UO = 100 * (4*a_n1 + 2*a_n2 + a_n3) / 7.  bp and tr are quantized to
    integer micro-units per row so all six window sums are exact integer
    arithmetic (the CMF/VWAP parity pattern).  First row per key has no
    prev_close -> NULL delta, skipped by every sum on both engines;
    warmup-gated at n3 non-null deltas."""
    out = out or f"uo_{n1}_{n2}_{n3}"
    kw = by_key()
    pc = F.lag("close").over(kw)
    # least/greatest SKIP nulls on both engines, so the first row's
    # missing prev_close must be gated explicitly or bp silently
    # degrades to close-low there instead of a skipped delta
    bp = F.when(pc.isNotNull(), F.col("close") - F.least(F.col("low"), pc))
    tr = F.when(
        pc.isNotNull(),
        F.greatest(F.col("high"), pc) - F.least(F.col("low"), pc),
    )
    df = df.withColumn(
        "_bpq", F.round(bp * F.lit(1000000.0), 0).cast("long")
    ).withColumn("_trq", F.round(tr * F.lit(1000000.0), 0).cast("long"))

    def avg_ratio(k: int):
        wk = by_key().rowsBetween(-(k - 1), 0)
        return F.sum("_bpq").over(wk).cast("double") / F.nullif(
            F.sum("_trq").over(wk).cast("double"), F.lit(0.0)
        )

    w3 = by_key().rowsBetween(-(n3 - 1), 0)
    cnt = F.count("_bpq").over(w3)
    uo = (
        F.lit(100.0)
        * (F.lit(4.0) * avg_ratio(n1) + F.lit(2.0) * avg_ratio(n2) + avg_ratio(n3))
        / F.lit(7.0)
    )
    return df.withColumn(out, _guarded(uo, cnt, n3)).drop("_bpq", "_trq")


def with_aroon(df: DataFrame, n: int = 25) -> DataFrame:
    """Aroon(n) up/down: position of the most recent n-row high/low
    inside the window, scaled to [0, 100] — 100 when the extreme is the
    current row, 0 when it sits at the oldest frame row.

    The 'bars since the high' lookup is a lexicographic struct extreme:
    MAX(struct(high, rn)) picks the highest high and, on exact ties, the
    LATEST row (rn ascends); the low side negates rn inside
    MIN(struct(low, -rn)) to get the same most-recent-on-tie convention.
    Struct ordering is identical in Spark and DuckDB, and no float
    arithmetic precedes the comparison (raw stored values), so the pick
    is parity-exact.  One layered window pass, no self-join."""
    kw = by_key()
    w = by_key().rowsBetween(-(n - 1), 0)
    df = df.withColumn("_rn", F.row_number().over(kw))
    hi_rn = F.max(F.struct(F.col("high"), F.col("_rn"))).over(w).getField("_rn")
    lo_rn = (
        -F.min(F.struct(F.col("low"), (-F.col("_rn")).alias("_nrn"))).over(w).getField(
            "_nrn"
        )
    )
    cnt = F.count("close").over(w)
    scale = float(n - 1)
    up = F.lit(100.0) * (F.lit(scale) - (F.col("_rn") - hi_rn)) / F.lit(scale)
    dn = F.lit(100.0) * (F.lit(scale) - (F.col("_rn") - lo_rn)) / F.lit(scale)
    return (
        df.withColumn(f"aroon_up_{n}", _guarded(up, cnt, n))
        .withColumn(f"aroon_dn_{n}", _guarded(dn, cnt, n))
        .drop("_rn")
    )


def with_cci(df: DataFrame, n: int = 20, out: str | None = None) -> DataFrame:
    """CCI(n) — Commodity Channel Index: (tp - SMA_n(tp)) / (0.015 *
    mean_deviation), tp = (high+low+close)/3, mean_deviation = avg |tp_i -
    SMA_n(tp)| over the SAME window.  The mean-deviation needs every
    window member's distance from the window's own mean — the bounded
    collect_list + aggregate() HOF pattern again (O(n) per row, JVM-side,
    left-to-right fold for oracle parity)."""
    out = out or f"cci_{n}"
    w = by_key().rowsBetween(-(n - 1), 0)
    tmp = (
        df.withColumn("_tp", (F.col("high") + F.col("low") + F.col("close")) / F.lit(3.0))
        .withColumn("_tp_mean", F.avg("_tp").over(w))
        .withColumn("_cnt", F.count("_tp").over(w))
        .withColumn("_lst", F.collect_list("_tp").over(w))
    )
    dev_sum = F.aggregate(
        F.transform(F.col("_lst"), lambda x: F.abs(x - F.col("_tp_mean"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    md = dev_sum / F.col("_cnt")
    cci = (F.col("_tp") - F.col("_tp_mean")) / F.nullif(F.lit(0.015) * md, F.lit(0.0))
    return tmp.withColumn(
        out, F.when(F.col("_cnt") >= n, F.round(cci, ROUND_DP))
    ).drop("_tp", "_tp_mean", "_cnt", "_lst")


def with_candle_patterns(df: DataFrame) -> DataFrame:
    """Single/two-bar candlestick pattern flags — doji, hammer, bullish/
    bearish engulfing — the classic discretionary signals as pure
    boolean window expressions (one LAG, zero Python, all comparisons
    between raw stored values scaled by exact integer constants, so the
    flags are hash-exact):

    - doji: |close-open| * 10 <= (high-low)            (body <= 10% range)
    - hammer: lower wick >= 2*body AND upper wick <= body
    - bull_engulf: prev bearish, current bullish, body engulfs prev body
    - bear_engulf: mirror"""
    kw = by_key()
    po, pc = F.lag("open").over(kw), F.lag("close").over(kw)
    body = F.abs(F.col("close") - F.col("open"))
    rng = F.col("high") - F.col("low")
    lower = F.least(F.col("open"), F.col("close")) - F.col("low")
    upper = F.col("high") - F.greatest(F.col("open"), F.col("close"))
    doji = body * F.lit(10.0) <= rng
    hammer = (lower >= F.lit(2.0) * body) & (upper <= body) & (body > 0)
    bull = (
        (pc < po)
        & (F.col("close") > F.col("open"))
        & (F.col("open") <= pc)
        & (F.col("close") >= po)
    )
    bear = (
        (pc > po)
        & (F.col("close") < F.col("open"))
        & (F.col("open") >= pc)
        & (F.col("close") <= po)
    )
    return (
        df.withColumn("is_doji", doji)
        .withColumn("is_hammer", hammer)
        .withColumn("bull_engulf", F.coalesce(bull, F.lit(False)))
        .withColumn("bear_engulf", F.coalesce(bear, F.lit(False)))
    )


def with_fractals(df: DataFrame, k: int = 2) -> DataFrame:
    """Williams fractal swing points: a row is a swing HIGH when its
    high is the strict maximum of the ±k-row neighborhood (and the
    neighborhood is complete — no edge-of-history fractals), symmetric
    for swing lows.  Strictness makes ties a non-signal on both
    engines, so no float hazard; the centered frame is the only
    indicator in the family that LOOKS AHEAD, which is why it's a
    labeling/backtest feature, never a live signal (documented)."""
    w = by_key().rowsBetween(-k, k)
    cnt = F.count(F.lit(1)).over(w)
    hh, ll = F.max("high").over(w), F.min("low").over(w)
    n_hh = F.size(
        F.filter(
            F.collect_list(F.col("high")).over(w), lambda x: x == F.col("high")
        )
    )
    n_ll = F.size(
        F.filter(F.collect_list(F.col("low")).over(w), lambda x: x == F.col("low"))
    )
    complete = cnt == (2 * k + 1)
    return df.withColumn(
        "swing_high", complete & (F.col("high") == hh) & (n_hh == 1)
    ).withColumn("swing_low", complete & (F.col("low") == ll) & (n_ll == 1))


def with_vortex(df: DataFrame, n: int = 14) -> DataFrame:
    """Vortex indicator VI+(n)/VI−(n): rolling Σ|high−prev_low| and
    Σ|low−prev_high| over rolling ΣTR.  All three summands are
    micro-quantized to exact integers per row (the VWAP pattern) so the
    window sums are accumulation-order-exact; each VI is then one
    division of exact integers, rounded 6dp.  Rows without a previous
    bar contribute NULL (skipped) and the COUNT gate requires n
    complete-with-prior rows."""
    w1 = by_key()
    pc = F.lag("close").over(w1)
    ph = F.lag("high").over(w1)
    pl = F.lag("low").over(w1)
    tr = F.greatest(
        F.col("high") - F.col("low"),
        F.abs(F.col("high") - pc),
        F.abs(F.col("low") - pc),
    )
    q = lambda x: F.when(pc.isNotNull(), F.round(x * F.lit(1000000.0), 0).cast("long"))
    df = (
        df.withColumn("_trq", q(tr))
        .withColumn("_vpq", q(F.abs(F.col("high") - pl)))
        .withColumn("_vmq", q(F.abs(F.col("low") - ph)))
    )
    w = by_key().rowsBetween(-(n - 1), 0)
    cnt = F.count("_trq").over(w)
    den = F.sum("_trq").over(w).cast("double")
    vip = F.sum("_vpq").over(w).cast("double") / F.nullif(den, F.lit(0.0))
    vim = F.sum("_vmq").over(w).cast("double") / F.nullif(den, F.lit(0.0))
    return (
        df.withColumn("vi_plus", F.when(cnt >= n, F.round(vip, 6)))
        .withColumn("vi_minus", F.when(cnt >= n, F.round(vim, 6)))
        .drop("_trq", "_vpq", "_vmq")
    )
