package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import graft.core.TextHash

/** Static bridges so the generated code is one static call per row (keeps the
  * expressions inside whole-stage codegen; no boxing beyond the array).
  */
object TextHashBridge {
  def charHash(s: org.apache.spark.unsafe.types.UTF8String): Long =
    TextHash.charHash(s.toString)

  def charHash64(s: org.apache.spark.unsafe.types.UTF8String): Long =
    TextHash.charHash64(s.toString)

  def simhash64(arr: ArrayData): Long = {
    val n = arr.numElements()
    val h1 = new Array[Long](n)
    val h2 = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i).toString
      h1(i) = TextHash.charHash(s); h2(i) = TextHash.charHash2(s)
      i += 1
    }
    TextHash.simhash64(h1, h2)
  }

  private def tokenHashes(arr: ArrayData): Array[Long] = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = TextHash.charHash(arr.getUTF8String(i).toString); i += 1 }
    out
  }

  def simhash(arr: ArrayData): Long = TextHash.simhash(tokenHashes(arr))

  def minhashSig(arr: ArrayData): ArrayData =
    new GenericArrayData(TextHash.minhashSig(tokenHashes(arr)))

  def minOrNeg(arr: ArrayData): Long = {
    val hs = tokenHashes(arr)
    if (hs.isEmpty) -1L else hs.min
  }
}

/** `char_hash(str)` — the shared rolling hash (TextHash.charHash). */
case class CharHashExpr(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "char_hash"
  override protected def nullSafeEval(v: Any): Any =
    TextHashBridge.charHash(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashBridge$$.MODULE$$.charHash($c)")
  override protected def withNewChildInternal(c: Expression): CharHashExpr = copy(child = c)
}

/** `simhash(array<string>)` — 31-bit SimHash of a token array. */
case class SimhashExpr(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"
  override protected def nullSafeEval(v: Any): Any =
    TextHashBridge.simhash(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashBridge$$.MODULE$$.simhash($c)")
  override protected def withNewChildInternal(c: Expression): SimhashExpr = copy(child = c)
}

/** `char_hash64(str)` — combined 60-bit content key (TextHash.charHash64);
  * the exact-dedup key (a single mod-P hash false-merges distinct docs at
  * ~45k-doc birthday scale — see TextHash.charHash2 doc).
  */
case class CharHash64Expr(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "char_hash64"
  override protected def nullSafeEval(v: Any): Any =
    TextHashBridge.charHash64(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashBridge$$.MODULE$$.charHash64($c)")
  override protected def withNewChildInternal(c: Expression): CharHash64Expr = copy(child = c)
}

/** `simhash64(array<string>)` — 62-bit SimHash of a token array
  * (TextHash.simhash64: two independent 31-bit halves).
  */
case class Simhash64Expr(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(v: Any): Any =
    TextHashBridge.simhash64(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashBridge$$.MODULE$$.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): Simhash64Expr = copy(child = c)
}

/** `minhash_sig(array<string>)` — k=32 MinHash signature of a shingle array. */
case class MinhashSigExpr(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(v: Any): Any =
    TextHashBridge.minhashSig(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashBridge$$.MODULE$$.minhashSig($c)")
  override protected def withNewChildInternal(c: Expression): MinhashSigExpr = copy(child = c)
}

/** `min_shingle_hash(array<string>)` — winnowing-style doc fingerprint:
  * min charHash over the shingles (−1 for an empty array).
  */
case class MinShingleHashExpr(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "min_shingle_hash"
  override protected def nullSafeEval(v: Any): Any =
    TextHashBridge.minOrNeg(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashBridge$$.MODULE$$.minOrNeg($c)")
  override protected def withNewChildInternal(c: Expression): MinShingleHashExpr = copy(child = c)
}

/** Sorted DISTINCT word-n-gram (shingle) hashes of a token array, computed
  * without materializing any shingle string: the rolling charHash runs
  * straight over token chars with a virtual ' ' separator, so
  * `shingle_hashes(toks, n)[i] == charHash(tok_i ⧺ ' ' ⧺ … ⧺ tok_{i+n-1})`
  * exactly — DuckDB oracle parity is preserved while the interpreted
  * higher-order-function path (transform+concat_ws+element_at, measured
  * ~19 µs/shingle) collapses into one primitive loop per row.
  * Dedup by HASH not string; a cross-doc mod-P collision (~1e-9/pair) is
  * the accepted trade documented in Dedup.
  */
object ShingleBridge {
  import graft.core.TextHash.{BASE, P, SEED}

  def shingleHashes(arr: ArrayData, n: Int): ArrayData = {
    val cnt = arr.numElements()
    val m = cnt - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val toks = new Array[String](cnt)
    var i = 0
    while (i < cnt) { toks(i) = arr.getUTF8String(i).toString; i += 1 }
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      var acc = SEED
      var j = 0
      while (j < n) {
        if (j > 0) acc = (acc * BASE + ' ') % P
        val t = toks(i + j)
        var k = 0
        while (k < t.length) { acc = (acc * BASE + t.charAt(k)) % P; k += 1 }
        j += 1
      }
      out(i) = acc
      i += 1
    }
    java.util.Arrays.sort(out)
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  def minhashFromHashes(arr: ArrayData): ArrayData =
    new GenericArrayData(graft.core.TextHash.minhashSig(arr.toLongArray()))

  /** POSITIONAL window hashes for substring-level dedup: out(i) = combined
    * 60-bit rolling hash (charHash·P + charHash2 form) of the n-token window
    * starting at token i — kept IN POSITION ORDER with multiplicity (no
    * sort/dedup): the operator needs to know WHERE each duplicated window
    * sits. The combined key matters here: a global "which window repeats"
    * aggregate over ~10^7+ windows is far past the ~45k birthday bound of a
    * single mod-P hash (same reasoning as Dedup.exactDedup's key).
    */
  def positionalWindowHashes(arr: ArrayData, n: Int): ArrayData = {
    import graft.core.TextHash.{BASE2, SEED2}
    val cnt = arr.numElements()
    val m = cnt - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val toks = new Array[String](cnt)
    var i = 0
    while (i < cnt) { toks(i) = arr.getUTF8String(i).toString; i += 1 }
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      var a1 = SEED
      var a2 = SEED2
      var j = 0
      while (j < n) {
        if (j > 0) { a1 = (a1 * BASE + ' ') % P; a2 = (a2 * BASE2 + ' ') % P }
        val t = toks(i + j)
        var k = 0
        while (k < t.length) {
          a1 = (a1 * BASE + t.charAt(k)) % P
          a2 = (a2 * BASE2 + t.charAt(k)) % P
          k += 1
        }
        j += 1
      }
      out(i) = a1 * P + a2
      i += 1
    }
    new GenericArrayData(out)
  }

  /** One-pass Gopher-repetition stats over a token array: [total n-grams,
    * distinct n-grams, most-frequent n-gram's count] by the same rolling
    * mod-P shingle hash as `shingleHashes`, but WITHOUT the dedup — counts
    * need multiplicity. Sort + run-length scan instead of a hash map: no
    * boxing, and the top count is the longest equal run.
    */
  def repetitionStats(arr: ArrayData, n: Int): ArrayData = {
    val cnt = arr.numElements()
    val m = cnt - n + 1
    if (m <= 0) return new GenericArrayData(Array(0L, 0L, 0L))
    val toks = new Array[String](cnt)
    var i = 0
    while (i < cnt) { toks(i) = arr.getUTF8String(i).toString; i += 1 }
    val hs = new Array[Long](m)
    i = 0
    while (i < m) {
      var acc = SEED
      var j = 0
      while (j < n) {
        if (j > 0) acc = (acc * BASE + ' ') % P
        val t = toks(i + j)
        var k = 0
        while (k < t.length) { acc = (acc * BASE + t.charAt(k)) % P; k += 1 }
        j += 1
      }
      hs(i) = acc
      i += 1
    }
    java.util.Arrays.sort(hs)
    var distinct = 0L
    var top = 0L
    var run = 0L
    i = 0
    while (i < m) {
      if (i == 0 || hs(i) != hs(i - 1)) { distinct += 1; run = 1L }
      else run += 1
      if (run > top) top = run
      i += 1
    }
    new GenericArrayData(Array(m.toLong, distinct, top))
  }
}

/** `positional_window_hashes(toks, n)` — see ShingleBridge.positionalWindowHashes. */
case class PositionalWindowHashesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "positional_window_hashes"
  override protected def nullSafeEval(v: Any): Any =
    ShingleBridge.positionalWindowHashes(v.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleBridge$$.MODULE$$.positionalWindowHashes($c, $n)")
  override protected def withNewChildInternal(c: Expression): PositionalWindowHashesExpr = copy(child = c)
}

case class ShingleHashesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override protected def nullSafeEval(v: Any): Any =
    ShingleBridge.shingleHashes(v.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleBridge$$.MODULE$$.shingleHashes($c, $n)")
  override protected def withNewChildInternal(c: Expression): ShingleHashesExpr = copy(child = c)
}

/** MinHash signature straight from a shingle-hash array. */
/** Single-pass text normalization, byte-for-byte equal to the regex chain
  * `trim(regexp_replace(regexp_replace(lower(s), "[^a-z0-9 ]", ""), " +", " "))`
  * (the q54/q55 oracle twins): UTF8String.toLowerCase first (same unicode
  * lowering as Spark's `lower`), then one pass over the UTF-8 BYTES — exact
  * because every non-ASCII code unit's bytes are >= 0x80, so the ASCII
  * class test never fires inside a multi-byte char. Dropped chars join
  * adjacent spaces into one run, exactly like the outside-in regex order;
  * leading/trailing runs are suppressed (= trim). Replaces two java.util
  * .regex NFA passes per row — measured 99.9 s -> sub-second scan cost on
  * 8M tripled captions (ProfilePipeline, same window as the 0.7 s
  * hash-only scan).
  */
object NormBridge {
  def normalize(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
    val b = s.toLowerCase.getBytes
    val out = new Array[Byte](b.length)
    var w = 0
    var pendingSpace = false
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && w > 0) { out(w) = ' '; w += 1 }
        pendingSpace = false
        out(w) = c; w += 1
      } else if (c == ' ') pendingSpace = true
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromBytes(java.util.Arrays.copyOf(out, w))
  }
}

/** One-pass quality counts over the RAW text bytes, integer-identical to
  * the HOF pipeline in TextAnalysis.quality (which interprets 3 lambda
  * passes per row): [n_chars, n_tokens, n_alpha, n_stop, n_tok_chars].
  * Exactness notes: `length()` counts code points — counted here by
  * skipping UTF-8 continuation bytes; `split(text, "\\s+")` uses Java's
  * ASCII-only \s, matched byte-for-byte; [A-Za-z] and the stopword set are
  * pure ASCII so multi-byte chars can never alias them.
  */
object QualityBridge {
  private val stopBytes: Array[Array[Byte]] =
    Array("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")
      .map(_.getBytes("UTF-8"))

  def qualityStats(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val b = s.getBytes
    var nChars = 0L; var nTokens = 0L; var nAlpha = 0L
    var nStop = 0L; var nTokChars = 0L
    var inToken = false
    var tokStart = 0
    var tokChars = 0L
    def endToken(endExcl: Int): Unit = {
      nTokens += 1
      nTokChars += tokChars
      val len = endExcl - tokStart
      var k = 0
      while (k < stopBytes.length) {
        val sw = stopBytes(k)
        if (sw.length == len) {
          var j = 0
          while (j < len && b(tokStart + j) == sw(j)) j += 1
          if (j == len) { nStop += 1; k = stopBytes.length }
          else k += 1
        } else k += 1
      }
    }
    var i = 0
    while (i < b.length) {
      val c = b(i)
      val isCont = (c & 0xC0) == 0x80
      if (!isCont) nChars += 1
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) nAlpha += 1
      val isWs = c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'
      if (isWs) {
        if (inToken) { endToken(i); inToken = false }
      } else {
        if (!inToken) { inToken = true; tokStart = i; tokChars = 0L }
        if (!isCont) tokChars += 1
      }
      i += 1
    }
    if (inToken) endToken(b.length)
    new GenericArrayData(Array(nChars, nTokens, nAlpha, nStop, nTokChars))
  }
}

/** Marker-word language scores in ONE pass: unicode-lower the text (same
  * lowering as `lower()`), tokenize on ASCII \s, and count exact-equality
  * hits against each language's marker byte strings. Scores returned in
  * the caller-provided marker-table order — argmax/tie-break stays in the
  * (cheap, post-barrier) Column layer so the documented rule lives in one
  * place. Replaces 25 interpreted `size(filter(...))` lambda scans per row.
  */
object LangBridge {
  def scores(s: org.apache.spark.unsafe.types.UTF8String,
             markers: Array[Array[Array[Byte]]]): ArrayData = {
    val b = s.toLowerCase.getBytes
    val out = new Array[Long](markers.length)
    var i = 0
    var tokStart = -1
    def endToken(endExcl: Int): Unit = {
      val len = endExcl - tokStart
      var l = 0
      while (l < markers.length) {
        val ws = markers(l)
        var k = 0
        while (k < ws.length) {
          val w = ws(k)
          if (w.length == len) {
            var j = 0
            while (j < len && b(tokStart + j) == w(j)) j += 1
            if (j == len) { out(l) += 1; k = ws.length }
            else k += 1
          } else k += 1
        }
        l += 1
      }
    }
    while (i < b.length) {
      val c = b(i)
      val isWs = c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'
      if (isWs) { if (tokStart >= 0) { endToken(i); tokStart = -1 } }
      else if (tokStart < 0) tokStart = i
      i += 1
    }
    if (tokStart >= 0) endToken(b.length)
    new GenericArrayData(out)
  }
}

case class LangScoresExpr(child: Expression, markers: Array[Array[Array[Byte]]])
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lang_scores"
  override protected def nullSafeEval(v: Any): Any =
    LangBridge.scores(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], markers)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langMarkers", markers, "byte[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.LangBridge$$.MODULE$$.scores($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): LangScoresExpr = copy(child = c)
}

/** Whitespace-token and wordpiece-match counts in one byte pass:
  * [n_ws_tokens, n_wordpieces], where wordpieces follow the regex
  * `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` — letter runs + digit runs + one
  * match per remaining non-\s CODE POINT (continuation bytes skipped).
  * Replaces a java.util.regex scan per row.
  */
object WordPieceBridge {
  def counts(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val b = s.getBytes
    var nTok = 0L; var nWp = 0L
    var inTok = false
    var prev = 0 // 0 = none/other, 1 = letter, 2 = digit
    var i = 0
    while (i < b.length) {
      val c = b(i)
      val isCont = (c & 0xC0) == 0x80
      val isWs = c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'
      val cat =
        if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) 1
        else if (c >= '0' && c <= '9') 2
        else 0
      if (isWs) {
        if (inTok) { nTok += 1; inTok = false }
        prev = 0
      } else {
        inTok = true
        if (cat == 0) { if (!isCont) nWp += 1; prev = 0 }
        else { if (cat != prev) nWp += 1; prev = cat }
      }
      i += 1
    }
    if (inTok) nTok += 1
    new GenericArrayData(Array(nTok, nWp))
  }
}

case class WordPieceCountsExpr(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "wordpiece_counts"
  override protected def nullSafeEval(v: Any): Any =
    WordPieceBridge.counts(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordPieceBridge$$.MODULE$$.counts($c)")
  override protected def withNewChildInternal(c: Expression): WordPieceCountsExpr = copy(child = c)
}

case class QualityStatsExpr(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "quality_stats"
  override protected def nullSafeEval(v: Any): Any =
    QualityBridge.qualityStats(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QualityBridge$$.MODULE$$.qualityStats($c)")
  override protected def withNewChildInternal(c: Expression): QualityStatsExpr = copy(child = c)
}

case class NormalizeTextExpr(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"
  override protected def nullSafeEval(v: Any): Any =
    NormBridge.normalize(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormBridge$$.MODULE$$.normalize($c)")
  override protected def withNewChildInternal(c: Expression): NormalizeTextExpr = copy(child = c)
}

case class RepetitionStatsExpr(child: Expression, n: Int) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "repetition_stats"
  override protected def nullSafeEval(v: Any): Any =
    ShingleBridge.repetitionStats(v.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleBridge$$.MODULE$$.repetitionStats($c, $n)")
  override protected def withNewChildInternal(c: Expression): RepetitionStatsExpr = copy(child = c)
}

case class MinhashFromHashesExpr(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_from_hashes"
  override protected def nullSafeEval(v: Any): Any =
    ShingleBridge.minhashFromHashes(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleBridge$$.MODULE$$.minhashFromHashes($c)")
  override protected def withNewChildInternal(c: Expression): MinhashFromHashesExpr = copy(child = c)
}

/** Exact int64 dot product of two quantized vectors — a primitive-array
  * loop instead of `aggregate(zip_with(...))`, which allocates a boxed
  * intermediate array per row pair (measured 17 s → ~2 s on the sf0.1
  * all-pairs cosine query).
  */
object DotBridge {
  def dot(a: ArrayData, b: ArrayData): Long = {
    val x = a.toLongArray(); val y = b.toLongArray()
    val n = math.min(x.length, y.length)
    var s = 0L
    var i = 0
    while (i < n) { s += x(i) * y(i); i += 1 }
    s
  }
}

case class DotQExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_q"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotBridge.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotBridge$$.MODULE$$.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotQExpr =
    copy(left = l, right = r)
}

/** Hyperplane-LSH bucket ids for a quantized vector: one bucket per table,
  * `planes` sign bits each. The plane matrix ((tables·planes) × dims int64
  * components) is built ONCE on the driver and rides the codegen references
  * array — the per-row work is a single static call over primitive arrays,
  * replacing a ~3000-term inline expression that overflowed Janino's 64 KB
  * method limit (observed; this is why it's an Expression, not a Column
  * combinator).
  */
object HyperplaneBridge {
  def buckets(vec: ArrayData, planeMatrix: Array[Array[Long]], planes: Int,
              tables: Int): ArrayData = {
    val v = vec.toLongArray()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var pl = 0
      while (pl < planes) {
        val row = planeMatrix(t * planes + pl)
        var dot = 0L
        var d = 0
        val n = math.min(v.length, row.length)
        while (d < n) { dot += v(d) * row(d); d += 1 }
        if (dot >= 0) bucket |= (1L << pl)
        pl += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

case class HyperplaneBucketsExpr(child: Expression, planeMatrix: Array[Array[Long]],
                                 planes: Int, tables: Int) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"
  override protected def nullSafeEval(v: Any): Any =
    HyperplaneBridge.buckets(v.asInstanceOf[ArrayData], planeMatrix, planes, tables)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("planeMatrix", planeMatrix, "long[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneBridge$$.MODULE$$.buckets($c, $m, $planes, $tables)")
  }
  override protected def withNewChildInternal(c: Expression): HyperplaneBucketsExpr =
    copy(child = c)
}

object TextFunctions {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
  def charHash(c: Column): Column = column(CharHashExpr(expression(c)))
  def charHash64(c: Column): Column = column(CharHash64Expr(expression(c)))
  def simhash(tokens: Column): Column = column(SimhashExpr(expression(tokens)))
  def simhash64(tokens: Column): Column = column(Simhash64Expr(expression(tokens)))
  def minhashSig(shingles: Column): Column = column(MinhashSigExpr(expression(shingles)))
  def minShingleHash(shingles: Column): Column = column(MinShingleHashExpr(expression(shingles)))
  def dotQ(a: Column, b: Column): Column = column(DotQExpr(expression(a), expression(b)))
  def shingleHashes(tokens: Column, n: Int): Column =
    column(ShingleHashesExpr(expression(tokens), n))
  def positionalWindowHashes(tokens: Column, n: Int): Column =
    column(PositionalWindowHashesExpr(expression(tokens), n))
  def repetitionStats(tokens: Column, n: Int): Column =
    column(RepetitionStatsExpr(expression(tokens), n))
  def normalizeText(s: Column): Column =
    column(NormalizeTextExpr(expression(s)))
  def qualityStats(s: Column): Column =
    column(QualityStatsExpr(expression(s)))
  def langScores(s: Column, markers: Array[Array[Array[Byte]]]): Column =
    column(LangScoresExpr(expression(s), markers))
  def wordpieceCounts(s: Column): Column =
    column(WordPieceCountsExpr(expression(s)))
  def minhashFromHashes(hashes: Column): Column =
    column(MinhashFromHashesExpr(expression(hashes)))
  def hyperplaneBuckets(quantVec: Column, planeMatrix: Array[Array[Long]],
                        planes: Int, tables: Int): Column =
    column(HyperplaneBucketsExpr(expression(quantVec), planeMatrix, planes, tables))
}
