package graft.core

import java.time._

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class DateTimeIndexSpec extends AnyFunSuite with Matchers {

  private val utc = ZoneOffset.UTC
  private def dt(s: String): ZonedDateTime =
    LocalDate.parse(s).atStartOfDay(utc)

  test("uniform index loc/time round trip, daily frequency") {
    val idx = DateTimeIndex.uniform(dt("2024-01-01"), 30, Frequency.days(1))
    idx.size shouldBe 30
    idx.dateTimeAtLoc(0) shouldBe dt("2024-01-01")
    idx.dateTimeAtLoc(29) shouldBe dt("2024-01-30")
    idx.locAtDateTime(dt("2024-01-15")) shouldBe 14
    idx.locAtDateTime(dt("2024-02-15")) shouldBe -1
    idx.locAtOrBeforeNanos(TimeUtils.toNanos(dt("2024-01-15").plusHours(5))) shouldBe 14
    idx.locAtOrAfterNanos(TimeUtils.toNanos(dt("2024-01-15").plusHours(5))) shouldBe 15
  }

  test("uniform index slicing") {
    val idx = DateTimeIndex.uniform(dt("2024-01-01"), 30, Frequency.days(1))
    val s = idx.slice(dt("2024-01-10"), dt("2024-01-20"))
    s.size shouldBe 11
    s.first shouldBe dt("2024-01-10")
    s.last shouldBe dt("2024-01-20")
  }

  test("irregular index binary search semantics") {
    val instants = Array("2024-01-01", "2024-01-03", "2024-01-07", "2024-01-20").map(s =>
      TimeUtils.toNanos(dt(s)))
    val idx = DateTimeIndex.irregular(instants)
    idx.locAtNanos(instants(2)) shouldBe 2
    idx.locAtNanos(instants(2) + 1) shouldBe -1
    idx.locAtOrBeforeNanos(instants(2) + 1) shouldBe 2
    idx.locAtOrBeforeNanos(instants(0) - 1) shouldBe -1
    idx.locAtOrAfterNanos(instants(2) + 1) shouldBe 3
    idx.sliceNanos(instants(1), instants(2)).size shouldBe 2
  }

  test("hybrid index spans segments") {
    val a = DateTimeIndex.uniform(dt("2024-01-01"), 10, Frequency.days(1))
    val b = DateTimeIndex.uniform(dt("2024-02-01"), 10, Frequency.days(1))
    val h = DateTimeIndex.hybrid(Array(a, b))
    h.size shouldBe 20
    h.dateTimeAtLoc(0) shouldBe dt("2024-01-01")
    h.dateTimeAtLoc(10) shouldBe dt("2024-02-01")
    h.locAtDateTime(dt("2024-02-05")) shouldBe 14
    h.locAtOrBeforeNanos(TimeUtils.toNanos(dt("2024-01-25"))) shouldBe 9
    h.locAtOrAfterNanos(TimeUtils.toNanos(dt("2024-01-25"))) shouldBe 10
  }

  test("index tag codec round-trips") {
    val u = DateTimeIndex.uniform(dt("2024-01-01"), 30, Frequency.days(1))
    DateTimeIndex.parse(u.tag) shouldBe u
    val i = DateTimeIndex.irregular(Array(1L, 5L, 9L))
    DateTimeIndex.parse(i.tag) shouldBe i
    val h = DateTimeIndex.hybrid(Array[DateTimeIndex](u, i))
    DateTimeIndex.parse(h.tag) shouldBe h
    val bd = DateTimeIndex.uniform(dt("2024-01-01"), 10, Frequency.businessDays(1))
    DateTimeIndex.parse(bd.tag) shouldBe bd
  }

  test("business-day frequency skips weekends") {
    val fri = dt("2024-01-05") // Friday
    val bd = Frequency.businessDays(1)
    bd.advance(fri, 1).getDayOfWeek shouldBe DayOfWeek.MONDAY
    bd.advance(fri, 1) shouldBe dt("2024-01-08")
    bd.advance(fri, 5) shouldBe dt("2024-01-12") // next Friday
    bd.difference(fri, dt("2024-01-12")) shouldBe 5
    bd.advance(dt("2024-01-08"), -1) shouldBe fri
  }

  test("business-day uniform index contains only weekdays") {
    val idx = DateTimeIndex.uniform(dt("2024-01-01"), 10, Frequency.businessDays(1))
    idx.toZonedDateTimeArray.foreach { d =>
      d.getDayOfWeek should not be DayOfWeek.SATURDAY
      d.getDayOfWeek should not be DayOfWeek.SUNDAY
    }
    idx.locAtDateTime(dt("2024-01-06")) shouldBe -1 // Saturday
    idx.locAtDateTime(dt("2024-01-08")) shouldBe 5
  }

  test("business-day grid across all firstDayOfWeek starts (reference FrequencySuite)") {
    // For each week start, the probe day is the SECOND day of that business
    // week (e.g. Sunday-start markets probe a Monday); the grid is the
    // reference's advance/difference matrix: same-week, exactly-a-week,
    // cross-weekend, more-than-a-week, two-weeks, beyond.
    val probe = Map(
      1 -> "2015-04-07", 2 -> "2015-04-08", 3 -> "2015-04-09",
      4 -> "2015-04-10", 5 -> "2015-04-11", 6 -> "2015-04-12",
      7 -> "2015-04-13")
    val grid = Seq((1, 1, 1), (2, 1, 2), (1, 2, 2), (5, 1, 7), (1, 5, 7),
      (4, 1, 6), (1, 4, 6), (6, 1, 8), (1, 6, 8), (10, 1, 14), (1, 10, 14),
      (12, 1, 16), (1, 12, 16))
    probe.foreach { case (fdow, dayStr) =>
      val day = dt(dayStr)
      grid.foreach { case (freqDays, steps, plainDays) =>
        withClue(s"fdow=$fdow freq=$freqDays steps=$steps: ") {
          Frequency.businessDays(freqDays, fdow).advance(day, steps) shouldBe
            day.plusDays(plainDays)
          Frequency.businessDays(freqDays, fdow)
            .difference(day, day.plusDays(plainDays)) shouldBe steps
        }
      }
    }
  }

  test("month/year frequencies use calendar arithmetic") {
    val mf = Frequency.months(1)
    mf.advance(dt("2024-01-31"), 1) shouldBe dt("2024-02-29") // leap clamp
    mf.difference(dt("2024-01-15"), dt("2024-04-15")) shouldBe 3
    Frequency.years(1).advance(dt("2024-02-29"), 1) shouldBe dt("2025-02-28")
  }

  test("union of indices is sorted-distinct") {
    val a = DateTimeIndex.irregular(Array(1L, 5L, 9L))
    val b = DateTimeIndex.irregular(Array(3L, 5L, 11L))
    val u = DateTimeIndex.union(Seq(a, b))
    u.toNanosArray shouldBe Array(1L, 3L, 5L, 9L, 11L)
    // two overlapping irregulars coalesce back to ONE irregular segment
    assert(u.isInstanceOf[IrregularDateTimeIndex])
  }

  // ---- union segment structure mirrors the reference's
  // DateTimeIndexUtilsSuite (union/simplify cases) ----

  test("union: non-overlapping inputs keep their segments (any input order)") {
    val i1 = DateTimeIndex.uniform(dt("2015-04-10"), 5, Frequency.days(2))
    val i2 = DateTimeIndex.uniform(dt("2015-05-10"), 5, Frequency.days(2))
    val i3 = DateTimeIndex.irregular(Seq(dt("2015-06-10"), dt("2015-06-13"),
      dt("2015-06-15"), dt("2015-06-20"), dt("2015-06-25")))
    val want = DateTimeIndex.hybrid(Array(i1, i2, i3))
    DateTimeIndex.union(Seq(i1, i2, i3)) shouldBe want
    DateTimeIndex.union(Seq(i3, i1, i2)) shouldBe want
  }

  test("union: overlapping uniform and irregular splits like the reference") {
    val i1 = DateTimeIndex.uniform(dt("2015-04-10"), 5, Frequency.days(2))
    val i2 = DateTimeIndex.uniform(dt("2015-05-10"), 5, Frequency.days(2))
    val i3 = DateTimeIndex.irregular(Seq(dt("2015-04-09"), dt("2015-04-11"),
      dt("2015-05-01"), dt("2015-05-10"), dt("2015-06-25")))
    DateTimeIndex.union(Seq(i3, i1, i2)) shouldBe DateTimeIndex.hybrid(Array(
      DateTimeIndex.irregular(Seq(dt("2015-04-09"), dt("2015-04-10"), dt("2015-04-11"))),
      DateTimeIndex.uniform(dt("2015-04-12"), 4, Frequency.days(2)),
      DateTimeIndex.irregular(Seq(dt("2015-05-01"), dt("2015-05-10"))),
      DateTimeIndex.uniform(dt("2015-05-12"), 4, Frequency.days(2)),
      DateTimeIndex.irregular(Seq(dt("2015-06-25")))))
  }

  test("union of long uniform calendars stays O(segments), not O(periods)") {
    // ten years of days + ten years of days, overlapping by five: the old
    // implementation materialized ~5.5k longs; now it is ONE uniform
    val a = DateTimeIndex.uniform(dt("2000-01-01"), 3653, Frequency.days(1))
    val b = DateTimeIndex.uniform(dt("2005-01-01"), 3652, Frequency.days(1))
    val u = DateTimeIndex.union(Seq(a, b))
    assert(u.isInstanceOf[UniformDateTimeIndex])
    u.size shouldBe 5479 // 2000-01-01 .. 2014-12-31, four leap years
    u.first shouldBe dt("2000-01-01")
    u.last shouldBe dt("2014-12-31")
  }

  test("islice preserves uniformity and hybrid structure") {
    val u = DateTimeIndex.uniform(dt("2024-01-01"), 10, Frequency.days(1))
    val s = u.islice(2, 7)
    assert(s.isInstanceOf[UniformDateTimeIndex])
    s.first shouldBe dt("2024-01-03")
    s.size shouldBe 5
    val h = DateTimeIndex.hybrid(Array(
      DateTimeIndex.uniform(dt("2024-01-01"), 3, Frequency.days(1)),
      DateTimeIndex.irregular(Array(100L, 200L))))
    val hs = h.islice(1, 4)
    hs.size shouldBe 3
    hs.toNanosArray shouldBe Array(
      TimeUtils.toNanos(dt("2024-01-02")), TimeUtils.toNanos(dt("2024-01-03")), 100L)
  }

  test("zone changes preserve instants") {
    val idx = DateTimeIndex.uniform(dt("2024-01-01"), 5, Frequency.days(1))
    val ny = idx.atZone(ZoneId.of("America/New_York"))
    ny.nanosAtLoc(3) shouldBe idx.nanosAtLoc(3)
  }
}
