package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed snapshot diff — the lake-maintenance audit between two
  * versions of a table: which keys were ADDED, REMOVED, or CHANGED.
  * The validation step behind every incremental refresh ([[
  * graft.sources.Lake.upsertLatest]]'s contract says what SHOULD have
  * happened; this measures what DID), and the CDC primitive when a
  * source can only deliver full snapshots.
  *
  * Scale shape: ONE full-outer shuffle join on the key columns —
  * nothing quadratic, no windows; both sides stream through
  * hash-partitioned on the same key, and the classification is a
  * codegen'd null-check/`<=>` projection. Unchanged rows are dropped
  * before they leave the join projection, so output volume is the
  * CHANGE volume, not the table volume.
  *
  * NULL semantics: rows whose key contains a null never join (SQL
  * equality — identical in any engine, so the oracle replays it);
  * such a row surfaces as one `removed` and one `added`. Compare
  * columns use null-safe equality (`<=>` / IS NOT DISTINCT FROM):
  * null → null is unchanged, null → value is changed. */
object Diff {

  /** Diff `newDf` against `oldDf` on `keyCols`, comparing
    * `compareCols`. Output: keyCols..., `change_type`
    * (added|removed|changed), and `old_<c>` / `new_<c>` per compare
    * column (null on the absent side). Unchanged keys are omitted. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff: no key columns")
    require(compareCols.nonEmpty, "snapshotDiff: no compare columns")
    require((keyCols ++ compareCols).distinct.size ==
      keyCols.size + compareCols.size,
      s"snapshotDiff: key/compare overlap or duplicates in " +
        s"$keyCols vs $compareCols")
    val o = oldDf.select(keyCols.map(col) ++
      compareCols.map(c => col(c).as(s"old_$c")) :+
      lit(1).as("__in_old"): _*)
    val n = newDf.select(keyCols.map(col) ++
      compareCols.map(c => col(c).as(s"new_$c")) :+
      lit(1).as("__in_new"): _*)
    val joined = o.join(n, keyCols, "full_outer")
    val changed = compareCols.map(c =>
      !(col(s"old_$c") <=> col(s"new_$c"))).reduce(_ || _)
    joined
      .withColumn("change_type",
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(changed, lit("changed")))
      .filter(col("change_type").isNotNull)
      .select((keyCols.map(col) :+ col("change_type")) ++
        compareCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }
}
