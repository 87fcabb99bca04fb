package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session (one per suite, SURVEY §5).
  *
  * Known shared-state leak: TrainingPipelineSpec's reliable-checkpoint
  * test calls `sparkContext.setCheckpointDir` (irreversible) on this
  * JVM-global context, so any suite running after it sees a checkpoint
  * dir set. Tests that depend on the dir being UNSET must guard on
  * `sparkContext.getCheckpointDir.isEmpty` rather than assume order. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
