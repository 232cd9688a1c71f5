"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ``akash2704/trading-etl-python`` repo
(real-time stock indicator ETL), rebuilt Spark-first:

- DataFrame/SQL declarative plans (Catalyst optimizes; no hand scheduling)
- window-native technical indicators (SURVEY.md §2.1 W1-W14)
- Arrow-vectorized ``applyInPandas`` only for the linear-recurrence
  indicator family (EMA/RSI/MACD/ATR/ADX) that no fixed-frame window
  aggregate can express
- Structured Streaming wrapper for the reference's Kafka consumer path
- LLM-data-pipeline extensions: dedup (exact/MinHash/SimHash/Jaccard),
  vector similarity search, text analysis, multimodal column plumbing

Everything is designed for a multi-executor cluster at large scale
(bounded per-key state, date partitioning, broadcast-able dims, AQE) even
though the test harness runs ``local[*]``.
"""

__version__ = "0.1.0"
