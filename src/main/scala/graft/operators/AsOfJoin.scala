package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: every probe row picks the reference row with the
  * LATEST time <= its own time for the same key — the
  * point-in-time lookup (crawl metadata valid at fetch time, price at
  * trade time) that an equi-join cannot express and a range join
  * explodes on. Spark has no native operator; the scale-safe
  * realization is the union + ordered carry-forward trick:
  *
  *   union both sides tagged → ONE shuffle by key → within each key,
  *   sort by (time, side) and carry the last reference payload forward
  *   (`last(..., ignoreNulls)` over an unbounded-to-current frame) →
  *   keep probe rows.
  *
  * Cost is exactly one hash shuffle + partition-local sort of
  * |probe| + |reference| rows — no range-join candidate explosion, no
  * per-key driver state, works at any key cardinality (a hot key costs
  * one task's sort, the politeness decomposition applies if one key
  * exceeds a task). Ties: a reference row AT the probe's timestamp
  * matches (inclusive, `side` orders reference before probe), matching
  * DuckDB's `ASOF JOIN ... ON probe.t >= ref.t` — the oracle twin.
  *
  * `reference` must be unique per (key, time) — pre-aggregate it
  * otherwise, or the carried payload would depend on row order.
  * Reference columns come back as `r_<name>`; probes with no earlier
  * reference row get nulls (left semantics).
  */
object AsOfJoin {

  def asOf(probe: DataFrame, reference: DataFrame,
           keyCol: String, timeCol: String,
           refCols: Seq[String]): DataFrame = {
    val rv = struct(refCols.map(col): _*)
    val probeCols = probe.columns.toSeq
    val rTagged = reference
      .select(col(keyCol), col(timeCol), rv.as("__rv"))
      .select(
        Seq(col(keyCol), col(timeCol), col("__rv")) ++
          probeCols.filterNot(Set(keyCol, timeCol))
            .map(c => lit(null).cast(probe.schema(c).dataType).as(c)): _*)
      .withColumn("__side", lit(0))
    val pTagged = probe
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(rTagged.schema("__rv").dataType))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    pTagged.unionByName(rTagged)
      .withColumn("__last", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(probeCols.map(col) ++
        refCols.map(c => col(s"__last.$c").as(s"r_$c")): _*)
  }
}
