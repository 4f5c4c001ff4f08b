"""Query/operator library over the driver testdata tables.

Each module exposes pairs of (Spark callable, DuckDB oracle SQL) with
IDENTICAL semantics and output column names — the driver compares them
value-by-value at sf=0.01 (see __spark_entry__.py).

Determinism rules used throughout (so Spark and DuckDB hash-match):
  * money/measure sums go through exact DECIMAL arithmetic, then one final
    cast to DOUBLE (identical decimals ⇒ identical doubles);
  * embedding math is quantized to integers (round(x*1000)) so dot products
    and norms are exact; only the final cosine division is floating point,
    computed from identical integers on both sides;
  * hashes are md5 (same lowercase hex in Spark and DuckDB); numeric hashes
    come from hex substrings via conv()/'0x'-cast (exact, ≤60 bits);
  * top-k orderings always tie-break on a unique key.
"""
