"""Hadoop FileSystem helpers shared by the batch pipeline and streaming state.

All state/resume probes must go through the Hadoop FileSystem API, never
os.path: out_dir / state_dir may be HDFS or S3 in production, where a
driver-local os.path.exists silently answers "missing" and a resumable run
would recompute (or clobber) every stage. The reference's analog is its
Supabase existence checks (reference dedupe_logic/processor.py:267, 447) —
state lives in the store, not on the driver's disk.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_fs(spark: SparkSession, path_str: str):
    """(FileSystem, Path) for path_str, resolved via its URI scheme."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def fs_exists(spark: SparkSession, path_str: str) -> bool:
    fs, hpath = hadoop_fs(spark, path_str)
    return bool(fs.exists(hpath))


def fs_touch(spark: SparkSession, path_str: str) -> None:
    """Create (or truncate) an empty marker file, creating parents."""
    fs, hpath = hadoop_fs(spark, path_str)
    fs.create(hpath, True).close()


def fs_delete(spark: SparkSession, path_str: str, recursive: bool = False) -> bool:
    fs, hpath = hadoop_fs(spark, path_str)
    return bool(fs.delete(hpath, recursive))


def fs_rename(spark: SparkSession, src: str, dst: str) -> bool:
    fs, spath = hadoop_fs(spark, src)
    _, dpath = hadoop_fs(spark, dst)
    return bool(fs.rename(spath, dpath))


def fs_list_names(spark: SparkSession, path_str: str) -> list[str]:
    """Child entry names of a directory ([] if it does not exist)."""
    fs, hpath = hadoop_fs(spark, path_str)
    if not fs.exists(hpath):
        return []
    return [st.getPath().getName() for st in fs.listStatus(hpath)]
