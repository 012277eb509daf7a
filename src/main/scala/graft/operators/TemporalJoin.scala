package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temporal joins over validity intervals — the general form of the
  * reference's entity-version temporal semantics (an OSM entity version is
  * valid on [validFrom, validTo) and a snapshot query resolves every
  * entity against a timestamp list
  * [ref: oshdb-api/…/mapreducer — snapshot view; OSHEntities validity]).
  * The as-of window join (q18) answers "latest version ≤ ts"; this
  * operator answers the containment form "which intervals cover ts".
  *
  * Plan: BIN bucketing — each interval explodes to the time bins it
  * covers, each instant computes exactly ONE bin, the join is a plain
  * equi-join on the bin, and the exact [start, end] containment filter
  * runs after. Because an instant lives in a single bin, every qualifying
  * (interval, instant) pair meets exactly once — no dedupe stage.
  *
  * Scale: pick `binSeconds` near the typical interval length — explode
  * factor ≈ len/bin + 1 per interval, instants stay 1 row each. Skewed
  * hot bins (many intervals covering one moment) behave like any hot join
  * key: AQE skew split applies, or salt the bin with a replicated
  * instant side (same recipe as SpatialJoin's salted cover cells).
  */
object TemporalJoin {

  /** All (interval, instant) pairs with start ≤ ts ≤ end (inclusive both
    * ends; epoch-second arithmetic, exact).
    */
  def intervalInstantJoin(intervals: DataFrame, startCol: Column, endCol: Column,
                          instants: DataFrame, tsCol: Column,
                          binSeconds: Long = 3600L): DataFrame = {
    require(binSeconds > 0)
    val iv = intervals
      .withColumn("_s", startCol.cast("timestamp").cast("long"))
      .withColumn("_e", endCol.cast("timestamp").cast("long"))
      .withColumn("_bin", explode(sequence(
        floor(col("_s") / binSeconds).cast("long"),
        floor(col("_e") / binSeconds).cast("long"))))
    val ins = instants
      .withColumn("_t", tsCol.cast("timestamp").cast("long"))
      .withColumn("_bin", floor(col("_t") / binSeconds).cast("long"))
    iv.join(ins, Seq("_bin"))
      .where(col("_t") >= col("_s") && col("_t") <= col("_e"))
      .drop("_bin", "_s", "_e", "_t")
  }

  /** All (left, right) interval pairs that OVERLAP (aStart ≤ bEnd ∧
    * bStart ≤ aEnd, inclusive). Both sides explode to bins, so a pair can
    * meet in several bins — the join emits it only in the FIRST shared bin
    * (max of the two start bins), keeping the output duplicate-free
    * without a distinct stage.
    *
    * Scale: same bin contract as [[intervalInstantJoin]]; explode factor
    * is len/bin per side, and the no-dedupe trick means no wide shuffle
    * after the join.
    */
  def intervalOverlapJoin(left: DataFrame, lStart: Column, lEnd: Column,
                          right: DataFrame, rStart: Column, rEnd: Column,
                          binSeconds: Long = 3600L): DataFrame = {
    require(binSeconds > 0)
    def binned(df: DataFrame, s: Column, e: Column, p: String): DataFrame =
      df.withColumn(s"_s$p", s.cast("timestamp").cast("long"))
        .withColumn(s"_e$p", e.cast("timestamp").cast("long"))
        .withColumn(s"_b0$p", floor(col(s"_s$p") / binSeconds).cast("long"))
        .withColumn("_bin", explode(sequence(col(s"_b0$p"),
          floor(col(s"_e$p") / binSeconds).cast("long"))))
    binned(left, lStart, lEnd, "a")
      .join(binned(right, rStart, rEnd, "b"), Seq("_bin"))
      .where(col("_sa") <= col("_eb") && col("_sb") <= col("_ea") &&
        col("_bin") === greatest(col("_b0a"), col("_b0b"))) // first shared bin only
      .drop("_bin", "_sa", "_ea", "_b0a", "_sb", "_eb", "_b0b")
  }
}
