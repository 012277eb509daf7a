package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators for large-scale training-data pipelines — the ops
  * a 100 TB text corpus needs before training (exact dedup, MinHash-LSH,
  * SimHash, n-gram Jaccard). No reference counterpart (OSHDB is spatial);
  * these extend the engine per the task brief, built in the same style:
  * shared integer kernels (graft.core.TextHash), declarative plans, oracle
  * SQL twins where ANSI-expressible.
  *
  * Scale notes per operator are in each method's doc.
  */
object Dedup {

  /** Whitespace tokens, empties dropped — semantics chosen to be
    * bit-identical to the DuckDB twin
    * `list_filter(string_split_regex(text,'\s+'), x -> x <> '')`.
    */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= lit(""))

  /** Distinct word n-grams (shingles) of a token array, space-joined. */
  def wordNgrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*))))
      .otherwise(array().cast("array<string>"))

  /** Exact dedup by content hash: one row per distinct text with its
    * canonical (minimum) id and the duplicate count.
    *
    * Scale: a single hash-aggregate on char_hash(text) — map-side partial
    * combine, no row ever carries the full text through the shuffle when
    * `carryText = false`.
    */
  def exactDedup(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    df.groupBy(charHash(textCol).as("text_hash"))
      .agg(min(idCol).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Exact n-gram Jaccard near-dup pairs via shingle-explode self-join:
    * |A∩B| per pair = count of shared distinct shingles, so
    * J = c / (|A| + |B| − c) with pure integer inputs.
    *
    * Scale: explode → shuffle on the shingle hash (not the text), count per
    * pair, filter. Hot shingles (boilerplate) are the skew risk — cap them
    * with `maxDocFreq`: a shingle occurring in more docs is dropped from
    * pair generation (standard near-dup practice; drops only pairs whose
    * entire overlap is boilerplate). DEFAULT OFF (exact) for oracle parity.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: Column, textCol: Column, n: Int,
                        threshold: Double, maxDocFreq: Long = Long.MaxValue): DataFrame = {
    val sh = df.select(idCol.as("doc_id"), wordNgrams(tokens(textCol), n).as("g"))
      .where(size(col("g")) > 0)
    val sizes = sh.select(col("doc_id"), size(col("g")).as("sz"))
    val ex0 = sh.select(col("doc_id"), explode(col("g")).as("gram"))
      .select(col("doc_id"), charHash(col("gram")).as("gh"))
    val ex =
      if (maxDocFreq == Long.MaxValue) ex0
      else {
        val hot = ex0.groupBy("gh").agg(count(lit(1)).as("df")).where(col("df") > maxDocFreq)
        ex0.join(broadcast(hot), Seq("gh"), "left_anti")
      }
    val common = ex.as("a").join(ex.as("b"),
        col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("c"))
    common
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard",
        col("c").cast("double") / (col("sz_a") + col("sz_b") - col("c")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash-LSH near-dup pairs: k=32 signature, `bands` bands of k/bands
    * rows; candidate pairs share at least one full band; candidates are then
    * VERIFIED with the exact Jaccard join above, so the output contains no
    * false positives — only (possibly) missed pairs, with miss probability
    * (1−J^r)^b (≈4e−12 for J=0.99, b=8, r=4).
    *
    * Scale: this is the 100 TB path — signatures are 32 longs per doc
    * (constant width), banding is a narrow shuffle on (band, bandHash), and
    * the expensive exact join runs only on candidates. Mega-buckets from
    * boilerplate are capped by `maxBucket` (a bucket larger than that is
    * all-pairs quadratic — skip or handle downstream).
    */
  def minhashLshPairs(df: DataFrame, idCol: Column, textCol: Column, n: Int,
                      threshold: Double, bands: Int = 8,
                      maxBucket: Int = 10000): DataFrame = {
    val r = graft.core.TextHash.MINHASH_K / bands
    val sh = df.select(idCol.as("doc_id"), wordNgrams(tokens(textCol), n).as("g"))
      .where(size(col("g")) > 0)
      .withColumn("sig", minhashSig(col("g")))
    val banded = sh.select(col("doc_id"), explode(
        array((0 until bands).map(b =>
          struct(lit(b).as("band"), hash(lit(b), slice(col("sig"), b * r + 1, r)).as("bh"))): _*)
      ).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bh"))
    val okBuckets = banded.groupBy("band", "bh").agg(count(lit(1)).as("bn"))
      .where(col("bn") <= maxBucket && col("bn") > 1)
    val inB = banded.join(okBuckets.select("band", "bh"), Seq("band", "bh"))
    val cand = inB.as("a").join(inB.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b")).distinct()
    // exact verify on the candidate pairs only
    val sizes = sh.select(col("doc_id"), size(col("g")).as("sz"))
    val ex = sh.select(col("doc_id"), explode(col("g")).as("gram"))
      .select(col("doc_id"), charHash(col("gram")).as("gh"))
    val common = cand
      .join(ex.withColumnRenamed("doc_id", "id_a").withColumnRenamed("gh", "gh_a"), "id_a")
      .join(ex.withColumnRenamed("doc_id", "id_b").withColumnRenamed("gh", "gh_b"), "id_b")
      .where(col("gh_a") === col("gh_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("c"))
    common
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard",
        col("c").cast("double") / (col("sz_a") + col("sz_b") - col("c")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Per-doc 31-bit SimHash (token multiset, ±1 bit votes). */
  def simhashDocs(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    df.select(idCol.as("doc_id"), simhash(tokens(textCol)).as("simhash"))

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, via band
    * pigeonhole: the 31 bits split into `maxDist+1` bands — ≤ maxDist flips
    * cannot touch every band, so matching on any one band is EXACT recall
    * (not probabilistic). Candidates verified with bit_count(a^b).
    *
    * Scale: each doc emits maxDist+1 (band, bandBits) keys — narrow shuffle,
    * quadratic only inside identical-band buckets.
    */
  def simhashPairs(df: DataFrame, idCol: Column, textCol: Column,
                   maxDist: Int = 3): DataFrame = {
    val bands = maxDist + 1
    val bits = graft.core.TextHash.SIMHASH_BITS
    val sh = simhashDocs(df, idCol, textCol)
    val banded = sh.select(col("doc_id"), col("simhash"), explode(array(
        (0 until bands).map { b =>
          val lo = b * bits / bands; val hi = (b + 1) * bits / bands
          val mask = ((1L << (hi - lo)) - 1) << lo
          struct(lit(b).as("band"), (col("simhash").bitwiseAND(lit(mask))).as("bb"))
        }: _*)).as("k"))
      .select(col("doc_id"), col("simhash"), col("k.band"), col("k.bb"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bb") === col("b.bb") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxDist)
  }
}
