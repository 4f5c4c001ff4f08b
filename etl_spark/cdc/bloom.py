"""Bloom-filter seen-set over lake-table keys.

Purpose (north-star "Bloom-filter-backed seen-set"): a compact, persisted
summary of every (conv_id, turn_idx) key ever written to the table. A Bloom
filter answers "possibly seen" / "DEFINITELY not seen"; only the negative
is certain, so it can never drop data — it is used to prove a batch is
pure-insert (no key possibly present), unlocking an append-only fast path
in the MERGE that skips reading and rewriting the target buckets entirely
(lake/merge.py). False positives merely fall back to the full merge —
harmless, exactly the composition SURVEY.md §7/M4 calls for.

Scale design: hashing happens in the JVM — ``h1 = xxhash64(*keys)``,
``h2 = xxhash64(1, *keys)`` (two INDEPENDENT hashes of the keys — h2 is
not a function of h1, so the Kirsch–Mitzenmacher analysis ``pos_i = h1 +
i*h2`` holds) — inside whole-stage codegen; the Python side of the Arrow
``mapInPandas`` stage only scatters uint64 positions into a numpy bitset
(no per-row Python anywhere). Per-partition partial bitsets are
tree-reduced: a narrow coalesce(_DRIVER_FANIN) + OR-combine stage runs in
the SAME job (no extra shuffle), so the driver receives at most
_DRIVER_FANIN bitsets regardless of input partition count — at 4096
partitions × 1 MiB the round-1 flat collect shipped 4 GiB through the
driver per micro-batch; this ships 8 MiB. At m=2^23 bits the sidecar is
1 MiB and holds ~600k keys at k=4 with ~2% FP — size m up for bigger
tables; saturation only degrades the fast-path hit rate, never
correctness.

xxhash64 is a fixed published algorithm (seed 42 in Spark), stable across
processes, restarts and partitionings, so the persisted filter stays valid
for the table's lifetime. Persisted sidecars are tagged with the hash algo
(``BLOOM_ALGO``); a mismatching tag disables the fast path (never wrong,
only slower) instead of misreading bits.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

DEFAULT_M_BITS = 1 << 23  # 1 MiB sidecar
DEFAULT_K = 4
BLOOM_ALGO = "xxh64km3"  # v3: type-canonical keys; v2: independent h2
_SEP = "\x1f"
_DRIVER_FANIN = 8  # max bitsets shipped to the driver per scan


def _key_series(pdf: pd.DataFrame, key_cols: list[str]) -> pd.Series:
    s = pdf[key_cols[0]].astype(str)
    for c in key_cols[1:]:
        s = s + _SEP + pdf[c].astype(str)
    return s


def _hash_pair(keys: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(h1, h2) uint64 pairs from the md5 digest — driver-side/pure-Python
    reference path (unit tests of the filter math; the distributed path
    hashes in the JVM via hash_frame)."""
    dig = keys.map(lambda s: hashlib.md5(s.encode()).digest())
    buf = np.frombuffer(b"".join(dig), dtype=np.uint64).reshape(-1, 2)
    return buf[:, 0], buf[:, 1]


def _canonical(df: DataFrame, c: str) -> F.Column:
    """Type-canonical key column for hashing: Spark's xxhash64 hashes
    int32 and int64 of the same VALUE to different words, so a schema
    widening (turn_idx int->long, allowed by the lattice) must not change
    a key's hash — integral keys always hash as long, everything else as
    string. Sidecars written under the pre-canonical algo carry an older
    BLOOM_ALGO tag and are ignored (fast path off, never wrong)."""
    t = df.schema[c].dataType
    if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return F.col(c).cast("long")
    return F.col(c).cast("string")


def _h1h2(df: DataFrame, key_cols: list[str]) -> tuple[F.Column, F.Column]:
    cols = [_canonical(df, c) for c in key_cols]
    return F.xxhash64(*cols), F.xxhash64(F.lit(1), *cols)


def hash_frame(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Project the key columns to the (h1, h2) double-hash pair, computed
    in the JVM (codegen, no Python). h2 hashes the keys with a prepended
    salt — independent of h1, as Kirsch–Mitzenmacher assumes."""
    h1, h2 = _h1h2(df, key_cols)
    return df.select(h1.alias("h1"), h2.alias("h2"))


def _tree_collect(parts: DataFrame, schema: str, combine) -> list:
    """Collect per-partition reduction rows through a narrow
    coalesce + combine stage: same job (coalesce is a narrow dependency,
    no shuffle), but the driver sees at most _DRIVER_FANIN rows."""
    return parts.coalesce(_DRIVER_FANIN).mapInPandas(combine, schema=schema).collect()


def _as_u64(a) -> np.ndarray:
    return np.asarray(a, dtype=np.int64).view(np.uint64)


class BloomFilter:
    def __init__(self, m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K,
                 bits: np.ndarray | None = None):
        assert m_bits % 8 == 0
        self.m_bits = m_bits
        self.k = k
        self.bits = bits if bits is not None else np.zeros(m_bits // 8, dtype=np.uint8)

    # ------------------------------------------------------------- positions
    def _positions_from(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        i = np.arange(self.k, dtype=np.uint64)[None, :]
        return (h1[:, None] + i * h2[:, None]) % np.uint64(self.m_bits)

    # ----------------------------------------------------------- hash-pair ops
    def add_hashes(self, h1, h2) -> None:
        h1, h2 = _as_u64(h1), _as_u64(h2)
        if len(h1) == 0:
            return
        pos = self._positions_from(h1, h2).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def might_contain_hashes(self, h1, h2) -> np.ndarray:
        h1, h2 = _as_u64(h1), _as_u64(h2)
        if len(h1) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions_from(h1, h2)
        byte = self.bits[(pos >> 3).astype(np.int64)]
        hit = (byte >> (pos & 7).astype(np.uint8)) & 1
        return hit.all(axis=1).astype(bool)

    # ----------------------------------------------- string-key ops (local)
    def add(self, keys: pd.Series) -> None:
        if len(keys) == 0:
            return
        self.add_hashes(*(h.view(np.int64) for h in _hash_pair(keys)))

    def might_contain(self, keys: pd.Series) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        return self.might_contain_hashes(
            *(h.view(np.int64) for h in _hash_pair(keys))
        )

    def union(self, other: "BloomFilter") -> "BloomFilter":
        assert (self.m_bits, self.k) == (other.m_bits, other.k)
        return BloomFilter(self.m_bits, self.k, np.bitwise_or(self.bits, other.bits))

    # ----------------------------------------------------------------- (de)ser
    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, m_bits: int, k: int) -> "BloomFilter":
        bits = np.frombuffer(data, dtype=np.uint8).copy()
        assert len(bits) == m_bits // 8
        return cls(m_bits, k, bits)


def build_bloom(
    df: DataFrame, key_cols: list[str], m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K
) -> BloomFilter:
    """Distributed build: JVM-hashed keys, per-partition partial bitsets via
    mapInPandas, OR-reduced on the driver."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        part = BloomFilter(m_bits, k)
        any_rows = False
        for pdf in batches:
            if len(pdf):
                any_rows = True
                part.add_hashes(pdf["h1"].to_numpy(), pdf["h2"].to_numpy())
        if any_rows:
            yield pd.DataFrame({"bits": [part.to_bytes()]})

    def combine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = None
        for pdf in batches:
            for b in pdf["bits"]:
                arr = np.frombuffer(b, dtype=np.uint8)
                acc = arr.copy() if acc is None else (acc | arr)
        if acc is not None:
            yield pd.DataFrame({"bits": [acc.tobytes()]})

    parts = _tree_collect(
        hash_frame(df, key_cols).mapInPandas(gen, schema="bits binary"),
        "bits binary", combine,
    )
    out = BloomFilter(m_bits, k)
    for row in parts:
        out.bits |= np.frombuffer(row["bits"], dtype=np.uint8)
    return out


def scan_batch_buckets(
    df: DataFrame, bloom: BloomFilter, key_cols: list[str], bucket_col: str
) -> tuple[bool, BloomFilter, list[int]]:
    """Seen-set probe + batch-key bloom + touched-bucket discovery in ONE pass:
    (any key possibly seen?, this batch's key-bloom, sorted distinct bucket
    ids). Replaces a separate distinct+collect job — at micro-batch cadence
    every eliminated job is wall time."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((bloom.to_bytes(), bloom.m_bits, bloom.k))

    h1, h2 = _h1h2(df, key_cols)
    proj = df.select(h1.alias("h1"), h2.alias("h2"), F.col(bucket_col).alias("b"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        data, m, kk = bc.value
        seen = BloomFilter.from_bytes(data, m, kk)
        part = BloomFilter(m, kk)
        hit = False
        buckets: set[int] = set()
        any_rows = False
        for pdf in batches:
            if len(pdf):
                any_rows = True
                h1v, h2v = pdf["h1"].to_numpy(), pdf["h2"].to_numpy()
                if not hit and bool(seen.might_contain_hashes(h1v, h2v).any()):
                    hit = True
                part.add_hashes(h1v, h2v)
                buckets.update(int(x) for x in np.unique(pdf["b"].to_numpy()))
        if any_rows:
            yield pd.DataFrame(
                {"bits": [part.to_bytes()], "hit": [hit], "buckets": [sorted(buckets)]}
            )

    def combine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc, hit = None, False
        bks: set[int] = set()
        for pdf in batches:
            for b, h, bk in zip(pdf["bits"], pdf["hit"], pdf["buckets"]):
                arr = np.frombuffer(b, dtype=np.uint8)
                acc = arr.copy() if acc is None else (acc | arr)
                hit = hit or bool(h)
                bks.update(int(x) for x in bk)
        if acc is not None:
            yield pd.DataFrame(
                {"bits": [acc.tobytes()], "hit": [hit], "buckets": [sorted(bks)]}
            )

    rows = _tree_collect(
        proj.mapInPandas(gen, schema="bits binary, hit boolean, buckets array<int>"),
        "bits binary, hit boolean, buckets array<int>", combine,
    )
    out = BloomFilter(bloom.m_bits, bloom.k)
    any_seen = False
    touched: set[int] = set()
    for r in rows:
        out.bits |= np.frombuffer(r["bits"], dtype=np.uint8)
        any_seen = any_seen or bool(r["hit"])
        touched.update(r["buckets"])
    return any_seen, out, sorted(touched)


def any_possibly_seen(
    df: DataFrame, bloom: BloomFilter, key_cols: list[str]
) -> bool:
    """True if ANY key of df might already be in the seen-set. A False
    answer is exact (no false negatives) — the append fast path is sound."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((bloom.to_bytes(), bloom.m_bits, bloom.k))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        data, m, kk = bc.value
        b = BloomFilter.from_bytes(data, m, kk)
        for pdf in batches:
            if len(pdf) and bool(
                b.might_contain_hashes(pdf["h1"].to_numpy(), pdf["h2"].to_numpy()).any()
            ):
                yield pd.DataFrame({"hit": [True]})
                return

    hits = (
        hash_frame(df, key_cols)
        .mapInPandas(gen, schema="hit boolean")
        .limit(1)
        .collect()
    )
    return len(hits) > 0


# --------------------------------------------------------------------------
# Per-data-file VALUE blooms (non-key column data skipping)
#
# Iceberg stores per-file bloom/ndv sketches in puffin sidecars so planners
# can skip data files on equality predicates over NON-partition columns —
# the manifest min/max stats only help for clustered columns (conv_id, ts).
# Same idea here: the write path summarizes each new data file's declared
# skip columns into a tiny bloom sidecar next to the file; point lookups on
# those columns prune to the files that might contain the probe value.
# Files written before the column was declared carry no sidecar and are
# simply never pruned — absent means "cannot skip", never wrong.
#
# Hashing is the driver-side md5 double-hash (_hash_pair) over a CANONICAL
# string rendering: integral values always hash as their decimal string so
# an int->long widening never changes a value's hash (same invariant the
# key seen-set enforces JVM-side via _canonical). Write and probe both go
# through canonical_value_strs — one rendering, two call sites.

VALUE_BLOOM_ALGO = "md5km-str1"
VALUE_BLOOM_K = 4
_VB_MIN_BITS = 1 << 12   # 512 B floor — micro-batch delta files are small
_VB_MAX_BITS = 1 << 20   # 128 KiB cap — compacted files degrade to a
                         # higher false-positive rate, never to wrongness


def canonical_value_strs(s: pd.Series) -> pd.Series:
    """NULL-dropped canonical strings of a value column. Integral dtypes
    (including pandas nullable Int*) render as plain decimal; everything
    else as str()."""
    s = s.dropna()
    if pd.api.types.is_integer_dtype(s.dtype):
        return s.astype("int64").astype(str)
    if pd.api.types.is_bool_dtype(s.dtype):
        return s.astype(bool).map({True: "true", False: "false"})
    return s.astype(str)


def canonical_value_str(v) -> str:
    """Probe-side rendering of one literal — must match
    canonical_value_strs element-wise."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    return str(v)


def build_value_bloom(s: pd.Series, k: int = VALUE_BLOOM_K) -> BloomFilter:
    """Bloom over one file's column values, sized ~16 bits per distinct
    value (k=4 → ~0.2% false-positive rate), power-of-two clamped to
    [512 B, 128 KiB]."""
    vals = canonical_value_strs(s)
    n = max(1, int(vals.nunique()))
    m_bits = 1 << int(np.ceil(np.log2(max(_VB_MIN_BITS, 16 * n))))
    bf = BloomFilter(min(m_bits, _VB_MAX_BITS), k)
    bf.add(vals)
    return bf
