"""Sequence packing / deterministic shuffle (`operators/packing.py`)."""

from pyspark.sql import functions as F

from graph4code_spark.operators.packing import (
    HASH_MULT,
    pack_sequences,
    shuffle_key,
)


def _py_pack(rows, seq_len, shuffle=True):
    keyed = [
        (i, n, (i * HASH_MULT) % 2**32 if shuffle else i) for i, n in rows
    ]
    keyed.sort(key=lambda r: (r[2], r[0]))
    out, off = {}, 0
    for i, n, k in keyed:
        first = off // seq_len
        last = (off + max(n, 1) - 1) // seq_len
        out[i] = (n, k, off, first, last > first)
        off += n
    return out


def test_pack_matches_sequential_reference(spark):
    rows = [(i, (i * 7) % 23 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, n long")
    got = {
        r["id"]: (
            r["n_tokens"], r["sort_key"], r["global_offset"],
            r["seq_id"], r["straddles"],
        )
        for r in pack_sequences(df, "id", "n", seq_len=64, n_buckets=8).collect()
    }
    assert got == _py_pack(rows, 64)


def test_pack_unshuffled_is_id_order(spark):
    rows = [(i, 10) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, n long")
    got = {
        r["id"]: (r["global_offset"], r["seq_id"])
        for r in pack_sequences(
            df, "id", "n", seq_len=25, n_buckets=4, shuffle=False
        ).collect()
    }
    for i in range(50):
        assert got[i] == (10 * i, (10 * i) // 25)


def test_pack_offsets_are_a_contiguous_scan(spark):
    rows = [(i, (i % 5) + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, n long")
    out = (
        pack_sequences(df, "id", "n", seq_len=32, n_buckets=16)
        .orderBy("sort_key", "id")
        .collect()
    )
    off = 0
    for r in out:
        assert r["global_offset"] == off
        off += r["n_tokens"]
    assert off == sum(n for _, n in rows)


def test_shuffle_key_is_a_permutation(spark):
    df = spark.range(1000).select(shuffle_key(F.col("id")).alias("k"))
    assert df.distinct().count() == 1000


def test_pack_no_global_single_partition_window(spark):
    df = spark.createDataFrame([(i, 5) for i in range(100)], "id long, n long")
    plan = (
        pack_sequences(df, "id", "n", seq_len=64, n_buckets=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the window must be partitioned by bucket, never a bare ORDER BY
    assert "Window [" in plan or "RunningWindowFunction" in plan or "Window" in plan
    assert "SinglePartition" not in plan


def test_pack_property_random_counts(spark):
    """Randomized ids/counts (incl. zeros and gaps) vs the sequential
    reference across several bucket counts."""
    import random

    rnd = random.Random(9)
    ids = rnd.sample(range(100_000), 300)
    rows = [(i, rnd.randint(0, 50)) for i in ids]
    df = spark.createDataFrame(rows, "id long, n long")
    for n_buckets in (1, 7, 64):
        got = {
            r["id"]: (r["global_offset"], r["seq_id"], r["straddles"])
            for r in pack_sequences(
                df, "id", "n", seq_len=128, n_buckets=n_buckets
            ).collect()
        }
        ref = _py_pack(rows, 128)
        for i, n in rows:
            _, _, off, first, strad = ref[i]
            assert got[i] == (off, first, strad), (n_buckets, i)


def test_pack_large_id_domain(spark):
    """shuffle_key past the old int64-wrap point (id >= ~3.47e9, where
    `id * 2654435761` overflows int64 — ADVICE r3): the split-multiply
    must equal exact arbitrary-precision math, and packing those ids
    must match the sequential reference."""
    from graph4code_spark.operators.packing import shuffle_key

    ids = [17, 3_500_000_000, 2**32 - 1, 2**32 + 5, 2**40 + 7, 2**62 + 3]
    rows = [(i, 10) for i in ids]
    df = spark.createDataFrame(rows, "id long, n long")
    got = {r["id"]: r["k"] for r in df.select("id", shuffle_key(F.col("id")).alias("k")).collect()}
    assert got == {i: (i % 2**32) * HASH_MULT % 2**32 for i in ids}
    packed = {
        r["id"]: (r["global_offset"], r["seq_id"], r["straddles"])
        for r in pack_sequences(df, "id", "n", seq_len=16).collect()
    }
    # arbitrary-precision Python math is the ground truth for the order
    keyed = sorted(ids, key=lambda i: ((i % 2**32) * HASH_MULT % 2**32, i))
    off = 0
    for i in keyed:
        assert packed[i] == (off, off // 16, (off + 9) // 16 > off // 16), i
        off += 10
