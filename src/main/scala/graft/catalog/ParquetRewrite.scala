package graft.catalog

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Shared staged-rewrite for plain-parquet "mutable" tables: write the new
  * contents to a staging dir, move the live dir aside, swap staging in,
  * and only then delete the old data. Every step that can fail does so
  * BEFORE the old data is gone — `FileSystem.rename` returns false instead
  * of throwing, so its result is checked and the old directory restored on
  * failure (the plain-parquet stand-in for a table-format transactional
  * commit).
  *
  * All path operations go through `org.apache.hadoop.fs.FileSystem` so the
  * same commit protocol works on local disk, HDFS, and S3A — `java.io.File`
  * silently fails off-local (rename returns false, exists always false),
  * which on the 100 TB substrate would turn every upsert into an overwrite.
  */
private[graft] object ParquetRewrite {

  def fs(s: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(s.sessionState.newHadoopConf())

  def rewrite(df: DataFrame, destPath: String): Unit = {
    val hfs = fs(df.sparkSession, destPath)
    val dst = new Path(destPath)
    val staging = new Path(destPath + ".staging")
    val old = new Path(destPath + ".old")
    hfs.delete(staging, true)
    hfs.delete(old, true)
    df.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    if (hfs.exists(dst) && !hfs.rename(dst, old))
      throw new java.io.IOException(s"rewrite: could not move $dst aside")
    if (!hfs.rename(staging, dst)) {
      // restore the previous table before failing
      if (hfs.exists(old)) hfs.rename(old, dst)
      throw new java.io.IOException(s"rewrite: could not move staging into $dst")
    }
    hfs.delete(old, true): Unit
  }
}
