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

  /** Build the dictionary for a column: (tag_id BIGINT dense from 0, tag).
    * One distinct-aggregate over the corpus; the window runs on the distinct
    * set only (small by the dictionary contract — see scale note above).
    */
  def build(df: DataFrame, c: Column): DataFrame =
    df.select(c.as("tag")).where(col("tag").isNotNull).distinct()
      .withColumn("tag_id", row_number().over(Window.orderBy("tag")).cast("long") - 1)
      .select("tag_id", "tag")

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
