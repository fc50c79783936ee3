package graft.catalog

import java.io.File

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Shared staged-rewrite for plain-parquet "mutable" tables: write the new
  * contents to a staging dir, move the live dir aside, swap staging in,
  * and only then delete the old data. Every step that can fail does so
  * BEFORE the old data is gone — `File.renameTo` returns false instead of
  * throwing, so its result is checked and the old directory restored on
  * failure (the plain-parquet stand-in for a table-format transactional
  * commit).
  */
private[graft] object ParquetRewrite {

  def rewrite(df: DataFrame, destPath: String): Unit = {
    val dst = new File(destPath)
    val staging = new File(destPath + ".staging")
    val old = new File(destPath + ".old")
    deleteRecursively(staging)
    deleteRecursively(old)
    df.write.mode(SaveMode.Overwrite).parquet(staging.getPath)
    if (dst.exists() && !dst.renameTo(old))
      throw new java.io.IOException(s"rewrite: could not move $dst aside")
    if (!staging.renameTo(dst)) {
      // restore the previous table before failing
      if (old.exists()) old.renameTo(dst)
      throw new java.io.IOException(s"rewrite: could not move staging into $dst")
    }
    deleteRecursively(old)
  }

  def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete(): Unit
  }
}
