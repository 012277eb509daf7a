package graft.filter

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's filter DSL re-targeted at tabular columns
  * [ref: oshdb-filter/…/FilterParser.java, FilterExpression.java; grammar
  * documented in the module README]:
  *
  *   expr     := or
  *   or       := and ('or' and)*
  *   and      := unary ('and' unary)*
  *   unary    := 'not' unary | '(' expr ')' | pred
  *   pred     := key '=' '*'        (present / not null)
  *             | key '!=' '*'       (absent / null)
  *             | key '=' value
  *             | key '!=' value
  *             | key 'in' '(' value (',' value)* ')'
  *             | key ':' '(' num '..' num ')'   (inclusive range; open ends ok)
  *             | key ':' value                  (id-style equality)
  *
  * Values are bare words or double-quoted strings. The parser builds an AST;
  * `normalize` rewrites to negation-pushed DNF exactly like the reference's
  * `FilterExpression.normalize()` (used there to split coarse OSH prefilters
  * from exact per-version checks — here Catalyst's own predicate pushdown
  * takes that role once we emit Columns, SURVEY.md O2).
  */
sealed trait FExpr {
  def and(o: FExpr): FExpr = FAnd(this, o)
  def or(o: FExpr): FExpr = FOr(this, o)
  def negate: FExpr = FNot(this)
}
final case class FEq(key: String, value: String) extends FExpr
final case class FNe(key: String, value: String) extends FExpr
final case class FPresent(key: String) extends FExpr
final case class FAbsent(key: String) extends FExpr
final case class FIn(key: String, values: Seq[String]) extends FExpr
final case class FRange(key: String, lo: Option[Double], hi: Option[Double]) extends FExpr
final case class FAnd(a: FExpr, b: FExpr) extends FExpr
final case class FOr(a: FExpr, b: FExpr) extends FExpr
final case class FNot(a: FExpr) extends FExpr

object FilterDsl {
  // ---------- parser ----------
  def parse(input: String): FExpr = {
    val p = new Parser(input)
    val e = p.parseOr()
    p.skipWs()
    require(p.eof, s"trailing input at ${p.pos}: '${input.drop(p.pos)}'")
    e
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit = while (!eof && s(pos).isWhitespace) pos += 1
    def peekWord(w: String): Boolean = {
      skipWs()
      s.regionMatches(true, pos, w, 0, w.length) &&
        (pos + w.length >= s.length || !s(pos + w.length).isLetterOrDigit)
    }
    def eatWord(w: String): Boolean = { if (peekWord(w)) { pos += w.length; true } else false }
    def eatChar(c: Char): Boolean = { skipWs(); if (!eof && s(pos) == c) { pos += 1; true } else false }
    def expect(c: Char): Unit = require(eatChar(c), s"expected '$c' at $pos in: $s")

    def parseOr(): FExpr = {
      var e = parseAnd()
      while (eatWord("or")) e = FOr(e, parseAnd())
      e
    }
    def parseAnd(): FExpr = {
      var e = parseUnary()
      while (eatWord("and")) e = FAnd(e, parseUnary())
      e
    }
    def parseUnary(): FExpr = {
      if (eatWord("not")) FNot(parseUnary())
      else if (eatChar('(')) { val e = parseOr(); expect(')'); e }
      else parsePred()
    }
    def token(): String = {
      skipWs()
      require(!eof, s"unexpected end of filter: $s")
      if (s(pos) == '"') {
        val end = s.indexOf('"', pos + 1)
        require(end > 0, s"unterminated quote at $pos")
        val t = s.substring(pos + 1, end); pos = end + 1; t
      } else {
        val start = pos
        while (!eof && !s(pos).isWhitespace && !"()=!:,".contains(s(pos))) pos += 1
        require(pos > start, s"expected token at $pos in: $s")
        s.substring(start, pos)
      }
    }
    def parsePred(): FExpr = {
      val key = token()
      skipWs()
      if (eatChar('=')) {
        val v = token(); if (v == "*") FPresent(key) else FEq(key, v)
      } else if (eatChar('!')) {
        expect('='); val v = token(); if (v == "*") FAbsent(key) else FNe(key, v)
      } else if (eatChar(':')) {
        skipWs()
        if (eatChar('(')) {
          // range (lo..hi) / (..hi) / (lo..) or id list (a,b,c)
          val body = { val end = s.indexOf(')', pos); require(end > 0, s"unterminated ( at $pos"); val b = s.substring(pos, end); pos = end + 1; b }
          if (body.contains("..")) {
            val Array(lo, hi) = body.split("\\.\\.", -1).map(_.trim)
            FRange(key, if (lo.isEmpty) None else Some(lo.toDouble), if (hi.isEmpty) None else Some(hi.toDouble))
          } else FIn(key, body.split(',').map(_.trim).toSeq)
        } else FEq(key, token())
      } else if (eatWord("in")) {
        expect('(')
        val vs = Seq.newBuilder[String]
        vs += token()
        while (eatChar(',')) vs += token()
        expect(')')
        FIn(key, vs.result())
      } else throw new IllegalArgumentException(s"expected predicate operator after '$key' at $pos in: $s")
    }
  }

  // ---------- normalize: negation-pushed disjunctive normal form ----------
  def normalize(e: FExpr): FExpr = toDnf(pushNot(e, neg = false))

  private def pushNot(e: FExpr, neg: Boolean): FExpr = e match {
    case FNot(a) => pushNot(a, !neg)
    case FAnd(a, b) => if (neg) FOr(pushNot(a, true), pushNot(b, true)) else FAnd(pushNot(a, false), pushNot(b, false))
    case FOr(a, b) => if (neg) FAnd(pushNot(a, true), pushNot(b, true)) else FOr(pushNot(a, false), pushNot(b, false))
    case FEq(k, v) => if (neg) FNe(k, v) else e
    case FNe(k, v) => if (neg) FEq(k, v) else e
    case FPresent(k) => if (neg) FAbsent(k) else e
    case FAbsent(k) => if (neg) FPresent(k) else e
    case leaf => if (neg) FNot(leaf) else leaf // FIn/FRange keep explicit Not
  }

  private def toDnf(e: FExpr): FExpr = e match {
    case FAnd(a, b) =>
      (toDnf(a), toDnf(b)) match {
        case (FOr(x, y), c) => toDnf(FOr(FAnd(x, c), FAnd(y, c)))
        case (c, FOr(x, y)) => toDnf(FOr(FAnd(c, x), FAnd(c, y)))
        case (x, y) => FAnd(x, y)
      }
    case FOr(a, b) => FOr(toDnf(a), toDnf(b))
    case other => other
  }

  // ---------- compile to Catalyst Column ----------
  /** Typed literal per the column's schema type. */
  private def lit4(dt: DataType, v: String): Column = dt match {
    case _: IntegerType => lit(v.toInt)
    case _: LongType => lit(v.toLong)
    case _: DoubleType => lit(v.toDouble)
    case _: FloatType => lit(v.toFloat)
    case _: BooleanType => lit(v.toBoolean)
    case _ => lit(v)
  }

  /** Compile to a Catalyst Column. `bindings` maps VIRTUAL keys to computed
    * columns — the upstream grammar's `geometry:polygon` / `area:(..)` /
    * `perimeter:(..)` / `vertices:(..)` predicates
    * [ref: oshdb-filter README — GeometryTypeFilter, GeometryFilterArea,
    * GeometryFilterPerimeter, GeometryFilterVertices], which bind to
    * geometry-derived values rather than schema columns. Standard geometry
    * bindings: [[graft.operators.SpatialJoin.geoBindings]].
    */
  def compile(e: FExpr, schema: StructType,
              bindings: Map[String, (Column, DataType)] = Map.empty): Column = {
    def dt(k: String): DataType =
      bindings.get(k).map(_._2).getOrElse(schema(k).dataType)
    def c(k: String): Column = bindings.get(k).map(_._1).getOrElse(col(k))
    e match {
      case FEq(k, v) => c(k) === lit4(dt(k), v)
      case FNe(k, v) => !(c(k) <=> lit4(dt(k), v)) // null-safe: absent != v
      case FPresent(k) => c(k).isNotNull
      case FAbsent(k) => c(k).isNull
      case FIn(k, vs) =>
        val typed: Seq[Any] = vs.map { v =>
          dt(k) match {
            case _: IntegerType => v.toInt
            case _: LongType => v.toLong
            case _: DoubleType => v.toDouble
            case _: FloatType => v.toFloat
            case _ => v
          }
        }
        c(k).isin(typed: _*)
      case FRange(k, lo, hi) =>
        val cc = c(k)
        (lo, hi) match {
          case (Some(a), Some(b)) => cc >= a && cc <= b
          case (Some(a), None) => cc >= a
          case (None, Some(b)) => cc <= b
          case (None, None) => lit(true)
        }
      case FAnd(a, b) => compile(a, schema, bindings) && compile(b, schema, bindings)
      case FOr(a, b) => compile(a, schema, bindings) || compile(b, schema, bindings)
      case FNot(a) => !compile(a, schema, bindings)
    }
  }

  /** Parse + compile in one step. */
  def toColumn(filter: String, schema: StructType,
               bindings: Map[String, (Column, DataType)] = Map.empty): Column =
    compile(parse(filter), schema, bindings)
}
