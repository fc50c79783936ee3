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
}
