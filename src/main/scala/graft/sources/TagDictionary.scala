package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A4: broadcast string-dictionary — the role of upstream's keytables +
  * `TagTranslator` [ref: oshdb-util/…/tagtranslator/TagTranslator.java;
  * oshdb keytables schema]: string attributes are translated to dense int
  * ids ONCE at the boundary, every downstream join/aggregate runs on ints,
  * and strings come back only at result decode.
  *
  * Scale contract: the dictionary is small by construction (distinct
  * attribute values — ~10^5..10^6 for tag-like columns even when the fact
  * table is 10^12 rows), so it BROADCASTS; `encode` is a broadcast hash
  * join — the big side never shuffles its strings, and after encoding the
  * string column can be dropped entirely (group-bys and joins carry an int).
  * Ids are assigned by sorted value order, so the same corpus always yields
  * the same dictionary (reproducible across runs and engines — an oracle
  * can re-derive ids with row_number() OVER (ORDER BY tag)).
  */
object TagDictionary {

  /** Build the dictionary for a column: (tag_id BIGINT dense from 0, tag,
    * ids == row_number() OVER (ORDER BY tag) − 1).
    *
    * Dense GLOBAL ranks without a single-partition window: range-partition
    * the distinct set by tag (range partitions come out in sorted order),
    * rank within each partition in parallel, then add per-partition offsets
    * (a partition-count-sized collect — scalar metadata, not data).
    */
  def build(df: DataFrame, c: Column): DataFrame = {
    val distinct = df.select(c.as("tag")).where(col("tag").isNotNull).distinct()
    val parts = math.max(2, distinct.sparkSession.sparkContext.defaultParallelism / 2)
    val ranged = distinct.repartitionByRange(parts, col("tag"))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint() // pin the partitioning: counts and ranks must see the same layout
    val counts = ranged.groupBy("_pid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until parts).scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L))
    val offsetExpr = (0 until parts).foldLeft(lit(0L)) { (e, p) =>
      when(col("_pid") === p, lit(offsets(p))).otherwise(e)
    }
    ranged
      .withColumn("_rn", row_number().over(Window.partitionBy("_pid").orderBy("tag")).cast("long"))
      .withColumn("tag_id", offsetExpr + col("_rn") - 1)
      .select("tag_id", "tag")
  }

  /** Encode: attach `as` = tag_id for column `c` via a broadcast join.
    * Rows whose value is absent from the dictionary get null (mirror of
    * TagTranslator's missing-key Optional). The string column itself is
    * NOT dropped here — callers drop it once nothing downstream needs it.
    */
  def encode(df: DataFrame, c: Column, dict: DataFrame, as: String = "tag_id"): DataFrame =
    df.join(broadcast(dict.select(col("tag_id").as(as), col("tag").as("_dict_tag"))),
        c === col("_dict_tag"), "left")
      .drop("_dict_tag")

  /** Decode: attach `as` = tag string for an id column (broadcast join —
    * runs on aggregated results, i.e. dictionary-sized inputs).
    */
  def decode(df: DataFrame, idCol: Column, dict: DataFrame, as: String = "tag"): DataFrame =
    df.join(broadcast(dict.select(col("tag_id").as("_dict_id"), col("tag").as(as))),
        idCol === col("_dict_id"), "left")
      .drop("_dict_id")
}
