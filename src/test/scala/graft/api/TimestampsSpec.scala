package graft.api

import org.scalatest.funsuite.AnyFunSuite

class TimestampsSpec extends AnyFunSuite {
  test("yearly expansion is calendar-aware and inclusive") {
    val ts = Timestamps.expandStrings("2014-01-01", "2017-01-01", "P1Y")
    assert(ts === Seq("2014-01-01 00:00:00", "2015-01-01 00:00:00",
      "2016-01-01 00:00:00", "2017-01-01 00:00:00"))
  }

  test("monthly steps land on month boundaries (incl. short months)") {
    val ts = Timestamps.expandStrings("2024-01-31", "2024-04-30", "P1M")
    // Java/ISO calendar arithmetic: Jan 31 + 1M = Feb 29 (leap), then Mar 29…
    assert(ts === Seq("2024-01-31 00:00:00", "2024-02-29 00:00:00",
      "2024-03-29 00:00:00", "2024-04-29 00:00:00"))
  }

  test("duration and mixed periods") {
    assert(Timestamps.expandStrings("2024-01-01", "2024-01-01T12:00:00", "PT6H").size === 3)
    assert(Timestamps.expandStrings("2024-01-01", "2024-01-04", "P1DT12H") ===
      Seq("2024-01-01 00:00:00", "2024-01-02 12:00:00", "2024-01-04 00:00:00"))
  }

  test("degenerate inputs rejected") {
    intercept[IllegalArgumentException] {
      Timestamps.expand("2024-01-02", "2024-01-01", "P1D")
    }
    intercept[IllegalArgumentException] {
      Timestamps.expand("2024-01-01", "2024-01-02", "P0D")
    }
    intercept[IllegalArgumentException] { Timestamps.parse("not-a-date") }
  }
}
