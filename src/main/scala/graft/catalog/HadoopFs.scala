package graft.catalog

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Hadoop-FileSystem resolution shared by the catalog planes. All path
  * operations go through `org.apache.hadoop.fs.FileSystem` so the commit
  * protocol behaves identically on local disk, HDFS, and S3A —
  * `java.io.File` silently fails off-local (rename returns false, exists
  * always false), which on the 100 TB substrate would turn every upsert
  * into an overwrite.
  */
private[graft] object HadoopFs {

  def fs(s: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(s.sessionState.newHadoopConf())

  /** Scheme-and-authority prefix of a path URI (`file://`, `s3a://bucket`,
    * `hdfs://nn:8020`, `file:` …). Stripping it from a path STRING yields
    * exactly `new Path(str).toUri.getPath` for the URI shapes the engine
    * meets — the one normalization every cross-source file-path join uses
    * (delete-file `file_path` vs `_metadata.file_path` vs pooled-file
    * maps), so authority-bearing URIs (S3A, HDFS) key identically to the
    * driver-side `getPath` form. All files of one table share one
    * filesystem, so dropping the authority cannot alias two files.
    */
  val UriPrefixRx = "^[a-zA-Z][a-zA-Z0-9+.-]*:(//[^/]*)?"
}
