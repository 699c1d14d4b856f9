"""File-format sources — the non-parquet scan legs of SURVEY.md §2.1.

S3 (tolmdb.py:78-88): the reference reads a manifest text file of
`path label` lines and opens each image file. Spark-side:
`spark.read.text` for the manifest (+ column split), and
`spark.read.format("binaryFile")` for the image bytes, joined on path.

S4 (trietree_correct.py:133-148): dictionary file of `word freq` lines,
whitespace-separated -> `spark.read.csv(sep=' ')` with an explicit
schema, the broadcast side of the correction join.

S5 (Test.java:99-122): stop-term dictionary, one term per line ->
`spark.read.text` + trim + distinct (the reference dedups via TreeSet,
SO1).

All three return DataFrames ready to ride broadcasts — these tables are
dictionary-sized by construction at any corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("label", T.StringType(), True),
    ]
)

DICTIONARY_SCHEMA = T.StructType(
    [
        T.StructField("word", T.StringType(), False),
        T.StructField("freq", T.LongType(), False),
    ]
)


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    """`path label` manifest lines (tolmdb.py:84-86 split semantics:
    first whitespace separates path from label; blank lines dropped)."""
    lines = spark.read.text(path)
    trimmed = F.trim(F.col("value"))
    return (
        lines.filter(trimmed != "")
        .select(
            F.split(trimmed, r"\s+", 2).alias("parts")
        )
        .select(
            F.col("parts").getItem(0).alias("path"),
            F.col("parts").getItem(1).alias("label"),
        )
    )


def read_image_files(spark: SparkSession, glob_path: str) -> DataFrame:
    """Binary media scan: (path, modificationTime, length, content).
    The production ingest leg for loose image files; pairs with
    read_manifest via an equi-join on path (J3's file-side analog)."""
    return spark.read.format("binaryFile").load(glob_path)


def read_labeled_images(spark: SparkSession, manifest_path: str, images_glob: str) -> DataFrame:
    """S3 end-to-end: manifest join binaryFile -> (path, label, content).
    The manifest is the small side -> broadcast."""
    manifest = read_manifest(spark, manifest_path)
    images = read_image_files(spark, images_glob).select(
        F.col("path").alias("file_uri"), "content"
    )
    # binaryFile paths are absolute URIs; manifest paths may be bare
    # file names or relative paths — hash-join on the trailing path
    # segment (the equi key), then require the full URI to end with the
    # normalized manifest path so two files with the same basename in
    # different directories can never cross-match (tolmdb.py:48-50
    # checks os.path.exists on the raw manifest path; here missing
    # files simply drop out of the join, P3)
    key = F.element_at(F.split(F.col("file_uri"), "/"), -1)
    norm = F.regexp_replace(F.col("path"), r"^\./", "")
    suffix = F.when(norm.startswith("/"), norm).otherwise(F.concat(F.lit("/"), norm))
    m = manifest.select(
        "path",
        "label",
        F.element_at(F.split(norm, "/"), -1).alias("fname"),
        suffix.alias("suffix"),
    )
    return (
        images.withColumn("img_fname", key)
        .join(
            F.broadcast(m),
            (F.col("img_fname") == m["fname"]) & F.col("file_uri").endswith(m["suffix"]),
        )
        .select("path", "label", "content")
    )


def read_dictionary(spark: SparkSession, path: str) -> DataFrame:
    """S4: `word freq` lines -> typed (word, freq) DataFrame."""
    return spark.read.csv(path, sep=" ", schema=DICTIONARY_SCHEMA)


def read_stop_terms(spark: SparkSession, path: str) -> DataFrame:
    """S5: one term per line, deduplicated (TreeSet semantics, SO1)."""
    return (
        spark.read.text(path)
        .select(F.trim("value").alias("term"))
        .filter(F.col("term") != "")
        .distinct()
    )


# ---------------------------------------------------------------------------
# sinks (S9/S10)
# ---------------------------------------------------------------------------

def write_dictionary(df: DataFrame, path: str) -> None:
    """S9 (readData.py:17-21): `word freq` lines, space-separated —
    the on-disk format the trie corrector consumes (trietree
    README:11). Single coalesced file is intentional: the dictionary is
    broadcast-sized by contract."""
    df.select("word", "freq").coalesce(1).write.mode("overwrite").csv(path, sep=" ")


def write_text_lines(df: DataFrame, path: str, column: str = "text") -> None:
    """S10 (Test.java:23-51): processed text, one line per row, written
    partition-parallel (the reference's BufferedWriter is single-stream;
    at corpus scale the sink must shard)."""
    df.select(F.col(column).alias("value")).write.mode("overwrite").text(path)
