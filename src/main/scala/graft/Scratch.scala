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
  * deletes alias to the same directory and the second is a no-op.
  * The defaultFS delete is gated behind `fs.exists`: this invocation
  * may never have written there (a read-only body, or a body that
  * failed before its first write), and an unconditional recursive
  * delete of a path the invocation did not create is not this
  * library's call to make — only the random temp suffix would stand
  * between it and someone else's data.
  *
  * RESULT-LIFETIME CONTRACT: the scratch directory is deleted when
  * `body` RETURNS, so a body that returns a DataFrame (or anything
  * lazy) reading from the scratch path must EAGERLY MATERIALIZE it
  * first (`localCheckpoint()`, a `collect`, or a write elsewhere) —
  * a lazy plan over deleted files fails at first action, or worse,
  * partially resolves against a recreated path. Every in-repo call
  * site (q140/q142…) checkpoints before returning; new callers own
  * the same obligation.
  *
  * EXCEPTION SEMANTICS: cleanup runs in `finally`, but a cleanup
  * failure never MASKS the body's exception — it is attached as a
  * suppressed throwable instead (the body's failure is the diagnosis;
  * a secondary delete error replacing it would hide the real bug).
  * If the body succeeded, a cleanup failure does propagate (a leaked
  * scratch dir on a happy path should be loud) — wrapped in an
  * `IllegalStateException` whose message states that THE BODY'S
  * EFFECTS ARE ALREADY COMMITTED (its writes, upserts, or returned
  * value's side effects happened before cleanup ran), with the delete
  * error as the cause. Callers treating the call as all-or-nothing
  * must NOT blindly re-run on this exception: the work is done, only
  * the scratch directory leaked. */
object Scratch {
  def withTempDir[T](spark: SparkSession, prefix: String)
      (body: String => T): T = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    var primary: Throwable = null
    try body(dir)
    catch { case t: Throwable => primary = t; throw t }
    finally {
      try {
        val conf = spark.sparkContext.hadoopConfiguration
        // wherever the body's schemeless path resolved (fs.defaultFS)
        // — deleted only if something was actually written there
        val p = new org.apache.hadoop.fs.Path(dir)
        val pfs = p.getFileSystem(conf)
        if (pfs.exists(p)) pfs.delete(p, true)
        // and the local directory createTempDirectory actually made
        val lp = new org.apache.hadoop.fs.Path("file://" + dir)
        val lfs = lp.getFileSystem(conf)
        if (lfs.exists(lp)) lfs.delete(lp, true)
      } catch {
        case cleanup: Throwable =>
          if (primary != null) primary.addSuppressed(cleanup)
          // happy path: the body SUCCEEDED, so its effects are already
          // committed — say so in the exception, or a caller that
          // treats this as "the work failed" double-runs committed
          // work (r15 ADVICE)
          else throw new IllegalStateException(
            s"scratch cleanup failed AFTER the body succeeded — the " +
            s"body's effects are already committed; do not re-run. " +
            s"Leaked scratch dir: $dir", cleanup)
      }
    }
  }
}
