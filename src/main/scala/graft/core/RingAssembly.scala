package graft.core

import org.locationtech.jts.geom.{Geometry, MultiPolygon, Polygon}
import org.locationtech.jts.geom.util.GeometryFixer

/** H1: geometry construction from parts — the role of upstream's
  * `OSHDBGeometryBuilder` [ref: oshdb-util/…/geometry/OSHDBGeometryBuilder
  * .java]: assemble polygon rings from unordered member ways, classify
  * shells vs holes by even-odd nesting, and ingest WKB (Polygon AND
  * MultiPolygon, with validity repair).
  *
  * The engine's runtime polygon form stays [[PolyM]]: a flat ring set under
  * EVEN-ODD semantics, which represents multipolygons-with-holes natively —
  * `Raycast.classify` already counts crossings over all rings, so disjoint
  * shells and nested holes need no extra kernel. What this module adds is
  * the construction edge: ways → rings, rings → validated geometry, WKB →
  * PolyM, and the shell/hole classification JTS needs for cover-cell
  * classification ([[Jts.toJtsEvenOdd]]).
  */
object RingAssembly {

  /** Stitch unordered open ways (polylines, endpoint-matched by exact
    * micro-degree coordinate equality — the OSM shared-node contract) into
    * closed rings. Ways may need reversal. Returns Left(reason) on unclosed
    * leftovers when `strict`, else drops them.
    */
  def assembleRings(ways: Seq[Array[(Long, Long)]],
                    strict: Boolean = true): Either[String, Array[RingM]] = {
    val pending = scala.collection.mutable.Set.from(ways.indices)
    val rings = Array.newBuilder[RingM]
    val dropped = Seq.newBuilder[Int]
    while (pending.nonEmpty) {
      val start = pending.head
      pending -= start
      val chain = scala.collection.mutable.ArrayBuffer.from(ways(start))
      var extended = true
      while (extended && chain.head != chain.last) {
        extended = false
        val tail = chain.last
        val it = pending.iterator
        var found = -1
        var rev = false
        while (it.hasNext && found < 0) {
          val j = it.next()
          val w = ways(j)
          if (w.head == tail) { found = j; rev = false }
          else if (w.last == tail) { found = j; rev = true }
        }
        if (found >= 0) {
          pending -= found
          val w = if (rev) ways(found).reverse else ways(found)
          chain ++= w.drop(1)
          extended = true
        }
      }
      if (chain.head == chain.last && chain.length >= 4)
        rings += RingM(chain.dropRight(1).map(_._1).toArray, chain.dropRight(1).map(_._2).toArray)
      else dropped += start
    }
    val d = dropped.result()
    if (d.nonEmpty && strict)
      Left(s"unclosed ring(s) from way indices ${d.mkString(",")} — " +
        "endpoints never met; fix the input or pass strict=false to drop them")
    else Right(rings.result())
  }

  /** Assemble ways straight to an even-odd [[PolyM]] (validated via JTS —
    * self-intersections or overlapping shells are rejected or fixed).
    */
  def multiPolyFromWays(ways: Seq[Array[(Long, Long)]], strict: Boolean = true,
                        fix: Boolean = false): Either[String, PolyM] =
    assembleRings(ways, strict).flatMap { rings =>
      if (rings.isEmpty) Left("no closed rings")
      else {
        val p = PolyM(rings)
        val g = Jts.toJtsEvenOdd(p)
        if (g.isValid) Right(p)
        else if (fix) Right(Jts.fromJtsAny(GeometryFixer.fix(g)))
        else Left("assembled rings form an invalid geometry (self-intersection " +
          "or overlapping shells); pass fix=true to repair via GeometryFixer")
      }
    }

  /** Relation members → geometry with the upstream FALLBACK arm [ref:
    * oshdb-util/…/geometry/OSHDBGeometryBuilder: only multipolygon-typed
    * relations build areal geometry; any other relation — or one whose
    * member ways do not close into valid rings — yields a
    * GeometryCollection of the member geometries]. Closed + valid rings
    * become the even-odd (Multi)Polygon; anything else degrades to a
    * GeometryCollection of the member ways as LineStrings — the
    * `geometry:other` class in the filter DSL (GeometryTypeFilter's
    * OTHER = GeometryCollection).
    */
  def relationGeometry(ways: Seq[Array[(Long, Long)]],
                       fix: Boolean = false): Geometry =
    multiPolyFromWays(ways, strict = true, fix = fix) match {
      case Right(p) => Jts.toJtsEvenOdd(p)
      case Left(_) =>
        val lines = ways.map { w =>
          Jts.factory.createLineString(
            w.map { case (x, y) =>
              new org.locationtech.jts.geom.Coordinate(x.toDouble, y.toDouble)
            }.toArray)
        }
        Jts.factory.createGeometryCollection(lines.toArray)
    }

  /** WKB (Polygon or MultiPolygon, micro-degree coordinates) → even-odd
    * [[PolyM]]. Invalid input is repaired via JTS GeometryFixer when
    * `fix`, else rejected.
    */
  def fromWkb(wkb: Array[Byte], fix: Boolean = false): Either[String, PolyM] = {
    val g = Jts.fromWkb(wkb)
    g match {
      case _: Polygon | _: MultiPolygon =>
        if (g.isValid) Right(Jts.fromJtsAny(g))
        else if (fix) Right(Jts.fromJtsAny(GeometryFixer.fix(g)))
        else Left(s"invalid ${g.getGeometryType} WKB; pass fix=true to repair")
      case other => Left(s"unsupported WKB geometry type ${other.getGeometryType}")
    }
  }
}
