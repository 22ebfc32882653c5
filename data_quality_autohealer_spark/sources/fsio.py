"""Small-file IO through Hadoop's FileSystem abstraction.

Sidecar files (e.g. the signature index's ``_sig_params.json``) must land
in the SAME storage system as the Spark output they describe. A local
``open()`` only works when the warehouse is a local filesystem path; on
HDFS/S3 the sidecar would land on the driver's local disk (or error) and
any guard keyed on it silently never fires (advice-r04). These helpers go
through ``Path.getFileSystem(hadoopConf)``, so they resolve ``file:``,
``hdfs:``, ``s3a:``… exactly like the DataFrame writers do.

Leading-underscore names keep the files invisible to Spark/Hadoop input
listings (the ``_SUCCESS`` convention), so a sidecar inside a parquet
directory never breaks schema inference.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def write_text(spark: SparkSession, path: str, text: str) -> None:
    """(Over)write ``text`` at ``path`` on whatever filesystem owns it."""
    fs, p = _fs_path(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_text(spark: SparkSession, path: str) -> str | None:
    """Contents of ``path``, or None when it does not exist."""
    fs, p = _fs_path(spark, path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8")
    finally:
        stream.close()
