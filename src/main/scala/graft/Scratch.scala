package graft

import org.apache.spark.sql.SparkSession

/** Per-invocation scratch directories with guaranteed cleanup — the
  * q74/q133 pattern centralized: the hand-rolled
  * createTempDirectory + finally-delete blocks each had to get the
  * filesystem resolution (never the default FS — an s3a:// session
  * would aim the delete at the wrong store) and the recursive delete
  * right; one helper means one place to audit. A fresh directory per
  * invocation also keeps concurrent runs from racing on a shared
  * scratch path (the retired q127 target/scratch hazard). */
object Scratch {
  def withTempDir[T](spark: SparkSession, prefix: String)
      (body: String => T): T = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    try body(dir) finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
    }
  }
}
