"""Distributed Bloom filter for corpus-scale membership dedup.

The reference's cross-table duplicate check (dropDuplicatesCrossTable,
DbImportWorker.java:477-520) is an anti-join of the incoming batch
against the existing table's key set. That is the right plan while both
sides fit a shuffle; at 100 TB-incoming vs PB-historical scale the
historical key set no longer shuffles — the scale-correct form is a
Bloom filter: build a fixed-size bitmap over the historical fingerprints
once, broadcast it, and probe map-side. No shuffle touches the corpus;
false negatives are impossible (a real duplicate is never kept), false
positives (a new doc wrongly dropped) are bounded by (1 - e^(-kn/m))^k
and driven arbitrarily low by sizing m.

Spark's own bloom_filter_agg/might_contain are internal (not in the
public function registry as of Spark 4.1), so this is a from-scratch
numpy implementation with Kirsch-Mitzenmacher double hashing: bit
positions (h1 + i*h2) mod m for i in 0..k-1, with h1/h2 computed
JVM-side as xxhash64 with two seeds. Build is one partial bitmap per
input partition (mapInPandas, Arrow-batched, no shuffle of the raw
hashes), then a two-level bitwise-OR reduction: partials are grouped
into TREE_FANOUT groups and OR'd executor-side, and only TREE_FANOUT
bitmap rows reach the driver — at 100k input partitions the driver
never sees more than TREE_FANOUT * m/8 bytes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TREE_FANOUT = 8


def fingerprint_cols(value: Column) -> tuple[Column, Column]:
    """The (h1, h2) double-hash pair for a value, computed JVM-side.

    xxhash64 with two different seed columns yields two independent
    64-bit hashes; all Bloom bit positions derive from these, so build
    and probe agree as long as both use this function.
    """
    return F.xxhash64(value), F.xxhash64(value, F.lit(0x9E3779B9))


def _bit_positions(h1: np.ndarray, h2: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(k, n) array of bit positions via double hashing, in uint64 math
    (Python/Java longs are signed; uint64 wrap-around keeps build and
    probe consistent)."""
    u1 = h1.astype(np.uint64)
    u2 = h2.astype(np.uint64)
    m = np.uint64(m_bits)
    pos = np.empty((k, len(u1)), dtype=np.uint64)
    for i in range(k):
        pos[i] = (u1 + np.uint64(i) * u2) % m
    return pos


def _set_bits(bits: np.ndarray, pos: np.ndarray) -> None:
    flat = pos.ravel()
    byte_idx = (flat >> np.uint64(3)).astype(np.int64)
    masks = (np.uint8(1) << (flat & np.uint64(7)).astype(np.uint8)).astype(np.uint8)
    # bitwise_or.at is unbuffered: two positions landing in the same byte
    # within one batch both take effect (plain fancy |= would drop one)
    np.bitwise_or.at(bits, byte_idx, masks)


def _test_bits(bits: np.ndarray, pos: np.ndarray) -> np.ndarray:
    byte_idx = (pos >> np.uint64(3)).astype(np.int64)
    shifts = (pos & np.uint64(7)).astype(np.uint8)
    hit = (bits[byte_idx] >> shifts) & np.uint8(1)
    return hit.all(axis=0)


def build_bloom(hashes: DataFrame, m_bits: int = 1 << 23, k: int = 7) -> bytes:
    """Build the bitmap over a DataFrame of (h1 bigint, h2 bigint) rows.

    Runs a Spark job (the tree-OR) and returns the final m_bits/8-byte
    bitmap to the driver — the one intentionally driver-sized object in
    this pipeline, analogous to the IVF codebook in
    functions/similarity.py.
    """
    if m_bits % 8:
        raise ValueError("m_bits must be a multiple of 8")
    nbytes = m_bits // 8

    def partial(batches):
        bits = np.zeros(nbytes, dtype=np.uint8)
        any_rows = False
        for pdf in batches:
            if len(pdf):
                any_rows = True
                pos = _bit_positions(
                    pdf["h1"].to_numpy(np.int64),
                    pdf["h2"].to_numpy(np.int64),
                    m_bits,
                    k,
                )
                _set_bits(bits, pos)
        if any_rows:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    def or_group(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(nbytes, dtype=np.uint8)
        for b in pdf["bits"]:
            acc |= np.frombuffer(b, dtype=np.uint8)
        return pd.DataFrame({"bits": [acc.tobytes()]})

    partials = hashes.select("h1", "h2").mapInPandas(partial, schema="bits binary")
    reduced = (
        partials.withColumn("g", F.spark_partition_id() % TREE_FANOUT)
        .groupBy("g")
        .applyInPandas(or_group, schema="bits binary")
    )
    acc = np.zeros(nbytes, dtype=np.uint8)
    for row in reduced.collect():
        acc |= np.frombuffer(row.bits, dtype=np.uint8)
    return acc.tobytes()


def bloom_contains_udf(spark: SparkSession, bloom: bytes, m_bits: int, k: int):
    """A pandas UDF (h1, h2) -> boolean probing a broadcast of the bitmap.

    The bitmap ships to executors once via sparkContext.broadcast (torrent
    distribution), not per-task in the serialized closure."""
    bc = spark.sparkContext.broadcast(bloom)

    def probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        pos = _bit_positions(
            h1.to_numpy(np.int64), h2.to_numpy(np.int64), m_bits, k
        )
        return pd.Series(_test_bits(bits, pos))

    return F.pandas_udf(probe, "boolean")


def false_positive_rate(n_items: int, m_bits: int, k: int) -> float:
    """Expected FP probability for sizing decisions (and tests)."""
    import math

    return (1.0 - math.exp(-k * n_items / m_bits)) ** k
