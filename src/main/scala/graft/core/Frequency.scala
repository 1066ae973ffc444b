package graft.core

import java.time._
import java.time.temporal.ChronoUnit

/**
 * A frequency: the spacing rule of a uniform [[DateTimeIndex]].
 *
 * Semantics mirror the reference's `Frequency` trait
 * (reference: src/main/scala/com/cloudera/sparkts/Frequency.scala:29-39):
 * `advance(dt, n)` moves a datetime forward by n periods and
 * `difference(dt1, dt2)` counts whole periods between two datetimes.
 * Implementation is brand-new: everything is computed on java.time,
 * instants carried as nanoseconds since epoch.
 */
sealed trait Frequency extends Serializable {
  def advance(dt: ZonedDateTime, n: Int): ZonedDateTime
  def difference(dt1: ZonedDateTime, dt2: ZonedDateTime): Int
  /** Short parseable tag, e.g. "days 7". Round-trips via Frequency.parse. */
  def tag: String
}

/** Fixed-duration frequency (nanosecond precision): N x unit durations. */
case class DurationFrequency(duration: Duration) extends Frequency {
  require(!duration.isZero && !duration.isNegative, "duration must be positive")
  val nanos: Long = duration.toNanos
  override def advance(dt: ZonedDateTime, n: Int): ZonedDateTime =
    dt.plus(duration.multipliedBy(n.toLong))
  override def difference(dt1: ZonedDateTime, dt2: ZonedDateTime): Int =
    (Duration.between(dt1, dt2).toNanos / nanos).toInt
  override def tag: String = s"durationNanos ${nanos}"
  override def toString: String = s"every ${duration}"
}

/** Calendar-day frequency: respects DST (a "day" can be 23h or 25h). */
case class DayFrequency(days: Int) extends Frequency {
  require(days > 0)
  override def advance(dt: ZonedDateTime, n: Int): ZonedDateTime =
    dt.plusDays(days.toLong * n)
  override def difference(dt1: ZonedDateTime, dt2: ZonedDateTime): Int =
    (ChronoUnit.DAYS.between(dt1, dt2) / days).toInt
  override def tag: String = s"days $days"
}

/** Calendar-month frequency. */
case class MonthFrequency(months: Int) extends Frequency {
  require(months > 0)
  override def advance(dt: ZonedDateTime, n: Int): ZonedDateTime =
    dt.plusMonths(months.toLong * n)
  override def difference(dt1: ZonedDateTime, dt2: ZonedDateTime): Int =
    (ChronoUnit.MONTHS.between(dt1, dt2) / months).toInt
  override def tag: String = s"months $months"
}

/** Calendar-year frequency. */
case class YearFrequency(years: Int) extends Frequency {
  require(years > 0)
  override def advance(dt: ZonedDateTime, n: Int): ZonedDateTime =
    dt.plusYears(years.toLong * n)
  override def difference(dt1: ZonedDateTime, dt2: ZonedDateTime): Int =
    (ChronoUnit.YEARS.between(dt1, dt2) / years).toInt
  override def tag: String = s"years $years"
}

/**
 * Business-day frequency: skips Saturday/Sunday relative to a configurable
 * first day of the business week (reference semantics:
 * src/main/scala/com/cloudera/sparkts/Frequency.scala:143-189, re-derived).
 *
 * `firstDayOfWeek` uses java.time.DayOfWeek numbering (MONDAY=1 .. SUNDAY=7).
 * Weekend days are always the 6th and 7th day of the business week.
 */
case class BusinessDayFrequency(days: Int, firstDayOfWeek: Int = DayOfWeek.MONDAY.getValue)
    extends Frequency {
  require(days > 0)
  require(firstDayOfWeek >= 1 && firstDayOfWeek <= 7)

  /** 0-based position of dt's weekday within the business week. */
  private def weekPos(dt: ZonedDateTime): Int =
    ((dt.getDayOfWeek.getValue - firstDayOfWeek) % 7 + 7) % 7

  def isBusinessDay(dt: ZonedDateTime): Boolean = weekPos(dt) < 5

  override def advance(dt: ZonedDateTime, n: Int): ZonedDateTime = {
    val steps = days * n
    if (steps == 0) return dt
    val sign = if (steps > 0) 1 else -1
    var remaining = math.abs(steps)
    var cur = dt
    // Start from a business day: a weekend start snaps like the reference
    // (advance from weekend counts from the adjacent business day).
    while (remaining > 0) {
      cur = cur.plusDays(sign.toLong)
      if (weekPos(cur) < 5) remaining -= 1
    }
    cur
  }

  override def difference(dt1: ZonedDateTime, dt2: ZonedDateTime): Int = {
    if (dt2.isBefore(dt1)) return -difference(dt2, dt1)
    // count business days strictly between, stepping days (fine for index math;
    // indices are generated via advance so differences stay small per call)
    val totalDays = ChronoUnit.DAYS.between(dt1, dt2)
    var count = 0L
    // closed-form: full weeks contribute 5 business days each
    val fullWeeks = totalDays / 7
    count += fullWeeks * 5
    var cur = dt1.plusDays(fullWeeks * 7)
    while (cur.isBefore(dt2)) {
      cur = cur.plusDays(1)
      if (weekPos(cur) < 5) count += 1
    }
    (count / days).toInt
  }
  override def tag: String = s"businessDays $days $firstDayOfWeek"
}

object Frequency {
  /** Convenience constructors mirroring the reference's public surface. */
  def nanoseconds(n: Long): DurationFrequency = DurationFrequency(Duration.ofNanos(n))
  def microseconds(n: Long): DurationFrequency = DurationFrequency(Duration.ofNanos(n * 1000L))
  def milliseconds(n: Long): DurationFrequency = DurationFrequency(Duration.ofMillis(n))
  def seconds(n: Long): DurationFrequency = DurationFrequency(Duration.ofSeconds(n))
  def minutes(n: Long): DurationFrequency = DurationFrequency(Duration.ofMinutes(n))
  def hours(n: Long): DurationFrequency = DurationFrequency(Duration.ofHours(n))
  def days(n: Int): DayFrequency = DayFrequency(n)
  def businessDays(n: Int, firstDayOfWeek: Int = 1): BusinessDayFrequency =
    BusinessDayFrequency(n, firstDayOfWeek)
  def months(n: Int): MonthFrequency = MonthFrequency(n)
  def years(n: Int): YearFrequency = YearFrequency(n)

  /** Parse a [[Frequency.tag]] back into a Frequency (sidecar codec). */
  def parse(s: String): Frequency = {
    val parts = s.trim.split("\\s+")
    parts(0) match {
      case "durationNanos" => nanoseconds(parts(1).toLong)
      case "days"          => days(parts(1).toInt)
      case "months"        => months(parts(1).toInt)
      case "years"         => years(parts(1).toInt)
      case "businessDays"  => businessDays(parts(1).toInt, parts(2).toInt)
      case other           => throw new IllegalArgumentException(s"bad frequency tag: $other")
    }
  }
}
