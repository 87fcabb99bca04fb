package graft

import org.apache.spark.sql.SparkSession

/** Per-invocation scratch directories with guaranteed cleanup — the
  * q74/q133 pattern centralized so there is ONE cleanup discipline to
  * audit, and a fresh directory per invocation keeps concurrent runs
  * from racing on a shared scratch path (the retired q127
  * target/scratch hazard).
  *
  * PATH SEMANTICS, stated honestly: the body receives a SCHEMELESS
  * local path, which Spark resolves against `fs.defaultFS` when
  * reading/writing — on the local-FS sessions this library tests
  * under, that IS the local directory `createTempDirectory` made. On
  * a session whose defaultFS is an object store, the body's data
  * lands under the SAME RELATIVE PATH on that store, so cleanup must
  * delete BOTH resolutions: the defaultFS one (where Spark wrote) and
  * the explicit `file://` one (the local staging dir, which would
  * otherwise leak on the driver). When defaultFS is local the two
  * deletes alias to the same directory and the second is a no-op. */
object Scratch {
  def withTempDir[T](spark: SparkSession, prefix: String)
      (body: String => T): T = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    try body(dir) finally {
      val conf = spark.sparkContext.hadoopConfiguration
      // wherever the body's schemeless path resolved (fs.defaultFS)
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(conf).delete(p, true)
      // and the local directory createTempDirectory actually made
      val lp = new org.apache.hadoop.fs.Path("file://" + dir)
      lp.getFileSystem(conf).delete(lp, true)
    }
  }
}
