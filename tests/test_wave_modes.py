"""The packed single-exchange wave (cfg.wave_mode='packed') must write
bit-identical postings files to the twophase reference path — same terms,
same encoded byte streams, same block metadata — on a corpus that spans
multiple segments, waves, salts, and NULL-bearing fields. The encoder's
per-run doc_id lexsort is what makes both modes order-independent."""

import pytest
from pyspark.sql import functions as F

from quicker_spark.fixtures import corpus_df
from quicker_spark.operators.build import IndexConfig, build_index


def _postings_key(spark, out):
    df = spark.read.parquet(out + "/postings")
    rows = df.select(
        "segment_id", "term", "df",
        F.md5(F.col("ids")).alias("h_ids"), F.md5(F.col("tfs")).alias("h_tfs"),
        F.md5(F.col("dls")).alias("h_dls"), F.md5(F.col("bits")).alias("h_bits"),
        F.col("block_last").cast("string").alias("bl"),
        F.col("block_max_u_ref").cast("string").alias("bu"),
        F.col("off_ids").cast("string").alias("oi"),
    ).collect()
    return sorted(tuple(r) for r in rows)


@pytest.mark.parametrize("n_salts", [1, 4])
def test_packed_wave_bit_identical(spark, tmp_path, n_salts):
    # inject NULL langs to exercise the fillna/no-term contract
    corpus = corpus_df(spark, 350, partitions=5).withColumn(
        "lang", F.when(F.crc32("path") % 7 == 0, F.lit(None))
        .otherwise(F.col("lang")))
    outs = {}
    for mode in ("twophase", "packed"):
        out = str(tmp_path / mode / f"s{n_salts}")
        cfg = IndexConfig(seg_docs=80, n_salts=n_salts, wave_segments=2,
                          block_size=16, wave_mode=mode)
        build_index(spark, corpus, out, cfg)
        outs[mode] = _postings_key(spark, out)
    assert outs["twophase"] == outs["packed"]
    assert len(outs["packed"]) > 100


def test_packed_wave_files_term_sorted(spark, tmp_path):
    """Row-group pruning depends on term-sorted files: every parquet file
    the packed wave writes must be internally term-ascending."""
    import glob

    import pyarrow.parquet as pq

    out = str(tmp_path / "sorted")
    build_index(spark, corpus_df(spark, 300, partitions=4), out,
                IndexConfig(seg_docs=100, wave_segments=4, block_size=16,
                            wave_mode="packed"))
    files = glob.glob(
        out + "/postings/wave=*/segment_id=*/bucket=*/*.parquet")
    assert files
    for f in files:
        terms = pq.read_table(f, columns=["term"])["term"].to_pylist()
        assert terms == sorted(terms), f


def _positions_key(spark, out):
    df = spark.read.parquet(out + "/positions")
    rows = df.select(
        "segment_id", "term", "df",
        F.md5(F.col("ids")).alias("h_ids"), F.md5(F.col("tfs")).alias("h_tfs"),
        F.md5(F.col("dls")).alias("h_dls"), F.md5(F.col("bits")).alias("h_bits"),
        F.md5(F.col("pos")).alias("h_pos"),
    ).collect()
    return sorted(tuple(r) for r in rows)


@pytest.mark.parametrize("n_salts", [1, 4])
def test_packed_positions_bit_identical(spark, tmp_path, n_salts):
    """The packed single-exchange positions wave must write bit-identical
    sidecar files to the twophase path — including the flat position
    stream, whose bytes depend on the encoder's doc-order gather being
    independent of partial arrival order. Multi-field sidecar exercises
    the field-namespace boundary (positions restart per field)."""
    from quicker_spark.operators.positions import build_positions

    corpus = corpus_df(spark, 350, partitions=5)
    outs = {}
    for mode in ("twophase", "packed"):
        out = str(tmp_path / mode / f"ps{n_salts}")
        cfg = IndexConfig(seg_docs=80, n_salts=n_salts, wave_segments=2,
                          block_size=16, wave_mode=mode)
        build_index(spark, corpus, out, cfg)
        build_positions(spark, out, fields=("content", "path"))
        outs[mode] = _positions_key(spark, out)
    assert outs["twophase"] == outs["packed"]
    assert len(outs["packed"]) > 100


def test_packed_positions_files_term_sorted(spark, tmp_path):
    """The positions term scan relies on the same row-group term pruning
    as the main postings: packed-mode sidecar files must be internally
    term-ascending."""
    import glob

    import pyarrow.parquet as pq

    from quicker_spark.operators.positions import build_positions

    out = str(tmp_path / "pos_sorted")
    build_index(spark, corpus_df(spark, 300, partitions=4), out,
                IndexConfig(seg_docs=100, wave_segments=4, block_size=16,
                            wave_mode="packed"))
    build_positions(spark, out, fields=("content",))
    files = glob.glob(
        out + "/positions/wave=*/segment_id=*/bucket=*/*.parquet")
    assert files
    for f in files:
        terms = pq.read_table(f, columns=["term"])["term"].to_pylist()
        assert terms == sorted(terms), f
