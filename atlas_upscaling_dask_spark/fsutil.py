"""Small-file text I/O through the JVM Hadoop FileSystem API.

Index builders persist tiny JSON sidecars (LSH params, BM25 corpus
stats, IVF centroids, volume metadata) next to their parquet data.  The
parquet goes through Spark's Hadoop FileSystem, so the sidecar must too
— a local ``open()`` would silently break every persisted-index path on
object stores (s3a://, hdfs://, ...).  These helpers route the bytes
through the same FileSystem the data files use, resolved from the
active Hadoop configuration, so a sidecar lands wherever its index
lands.

Sidecar names start with ``_`` so Spark's default PathFilter hides them
from the sibling dataset's file listing.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(conf), jpath, conf, jvm


def write_text(spark: SparkSession, path: str, text: str) -> None:
    """Write ``text`` (UTF-8) to ``path``, overwriting, via Hadoop FS."""
    fs, jpath, _, _ = _fs_and_path(spark, path)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists on its Hadoop FileSystem."""
    fs, jpath, _, _ = _fs_and_path(spark, path)
    return bool(fs.exists(jpath))


def has_parquet_files(spark: SparkSession, directory: str) -> bool:
    """True iff ``directory`` exists and directly contains at least one
    visible ``*.parquet`` file (Hadoop FS listing — works on any
    supported filesystem, not just local POSIX)."""
    fs, jpath, _, _ = _fs_and_path(spark, directory)
    if not fs.exists(jpath):
        return False
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if name.endswith(".parquet") and not name.startswith(("_", ".")):
            return True
    return False


def read_text(spark: SparkSession, path: str) -> str:
    """Read ``path`` as UTF-8 text via Hadoop FS."""
    fs, jpath, conf, jvm = _fs_and_path(spark, path)
    stream = fs.open(jpath)
    try:
        baos = jvm.java.io.ByteArrayOutputStream()
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, conf, False)
        return bytes(baos.toByteArray()).decode("utf-8")
    finally:
        stream.close()
