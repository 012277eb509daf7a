package graft.api

import java.time.{Duration, LocalDateTime, Period}
import java.time.format.DateTimeFormatter

/** ISO-8601 snapshot-timestamp expansion — the reference's
  * `timestamps(start, end, period)` surface
  * [ref: oshdb-util/…/time/OSHDBTimestamps.java, IsoDateTimeParser.java]:
  * "2014-01-01".."2020-01-01" step "P1Y" → the inclusive list of snapshot
  * instants. Calendar-aware (P1M lands on month boundaries like the
  * reference, not 30-day blocks); time-of-day steps via PTnH/nM/nS.
  */
object Timestamps {
  private val fmts = Seq(
    DateTimeFormatter.ISO_LOCAL_DATE_TIME,
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"),
    DateTimeFormatter.ISO_LOCAL_DATE)

  def parse(s: String): LocalDateTime = {
    fmts.view.flatMap { f =>
      try Some(
        if (f == DateTimeFormatter.ISO_LOCAL_DATE)
          java.time.LocalDate.parse(s, f).atStartOfDay()
        else LocalDateTime.parse(s, f))
      catch { case _: java.time.format.DateTimeParseException => None }
    }.headOption.getOrElse(throw new IllegalArgumentException(s"unparseable timestamp: $s"))
  }

  /** Inclusive [start, end] expansion by an ISO-8601 period/duration. */
  def expand(startIso: String, endIso: String, periodIso: String): Seq[LocalDateTime] = {
    val start = parse(startIso); val end = parse(endIso)
    require(!end.isBefore(start), "end before start")
    val upper = periodIso.toUpperCase
    val step: LocalDateTime => LocalDateTime =
      if (upper.startsWith("PT")) { val d = Duration.parse(upper); t => t.plus(d) }
      else if (upper.contains("T")) {
        // mixed date+time period like P1DT12H
        val tIdx = upper.indexOf('T')
        val p = Period.parse(upper.substring(0, tIdx))
        val d = Duration.parse("PT" + upper.substring(tIdx + 1))
        t => t.plus(p).plus(d)
      } else { val p = Period.parse(upper); t => t.plus(p) }
    val out = Seq.newBuilder[LocalDateTime]
    var t = start
    while (!t.isAfter(end)) {
      out += t
      val next = step(t)
      require(next.isAfter(t), s"period $periodIso does not advance time")
      t = next
    }
    out.result()
  }

  def expandStrings(startIso: String, endIso: String, periodIso: String): Seq[String] =
    expand(startIso, endIso, periodIso)
      .map(_.format(DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")))
}
