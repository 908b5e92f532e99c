"""mtslake.hashing.xxh64 must equal Spark's xxhash64 bit-for-bit (the
independence premise of the doc_simhash validity construction)."""

from pyspark.sql import functions as F

from mtslake.hashing import xxh64, xxh64_signed


def test_xxh64_public_vectors():
    # vectors from the public xxHash spec/reference
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999
    assert xxh64(b"a", 0) == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc", 0) == 0x44BC2CF5AD770999
    assert (
        xxh64(b"Nobody inspects the spammish repetition", 0)
        == 0xFBCEA83C8A378BF1
    )


def test_xxh64_signed_matches_spark_xxhash64(spark):
    samples = [
        "", "a", "hello", "the quick brown fox jumps over the lazy dog",
        "x" * 31, "y" * 32, "z" * 33, "w" * 100, "line\nbreak\ttab",
        "café naïve 中文 \U0001f600",
        "1234567890" * 7,
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", F.xxhash64("s").alias("h")).collect()
    }
    for s in samples:
        assert got[s] == xxh64_signed(s.encode("utf-8")), repr(s)


def test_xxh64_long_forms_match_spark(spark):
    import struct

    from mtslake.hashing import spark_xxhash64_longs, xxh64, xxh64_long

    vals = [0, 1, -1, 42, 2**62, -(2**62), 123456789012345, -987654321]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {
        r["x"]: (r["h1"], r["h2"])
        for r in df.select(
            "x",
            F.xxhash64("x").alias("h1"),
            F.xxhash64(F.col("x"), F.lit(7).cast("long")).alias("h2"),
        ).collect()
    }
    for v in vals:
        # closed form == byte-stream spec == Spark single column
        assert xxh64_long(v) == xxh64(struct.pack("<q", v))
        assert got[v][0] == spark_xxhash64_longs(v)
        # multi-column chaining (x, 7)
        assert got[v][1] == spark_xxhash64_longs(v, 7)
