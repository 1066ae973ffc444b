package graft.core

import java.time._
import java.util.Arrays

/**
 * Bi-directional mapping between integer locations and instants — the shared
 * time dimension of a collection of series.
 *
 * Same capability surface as the reference's DateTimeIndex
 * (reference: src/main/scala/com/cloudera/sparkts/DateTimeIndex.scala:28-156)
 * but a brand-new implementation: plain Scala over nanos-since-epoch longs,
 * designed as a small driver-side value object that is broadcast or
 * materialized to a DataFrame for joins (see graft.ts.TimeSeriesOps).
 *
 * Locations are 0-based, loc 0 is the earliest instant.
 */
sealed trait DateTimeIndex extends Serializable {
  def size: Int
  def zone: ZoneId
  def first: ZonedDateTime = dateTimeAtLoc(0)
  def last: ZonedDateTime = dateTimeAtLoc(size - 1)

  /** Instant at location loc. */
  def dateTimeAtLoc(loc: Int): ZonedDateTime
  /** Nanos-since-epoch at location loc. */
  def nanosAtLoc(loc: Int): Long
  /** Location of exact instant t, or -1 if absent. */
  def locAtNanos(t: Long): Int
  def locAtDateTime(dt: ZonedDateTime): Int = locAtNanos(TimeUtils.toNanos(dt))
  /** Location of the latest instant <= t, or -1 if t precedes the index. */
  def locAtOrBeforeNanos(t: Long): Int
  /** Location of the earliest instant >= t, or size if t follows the index. */
  def locAtOrAfterNanos(t: Long): Int
  /** All instants as nanos-since-epoch (materializes; O(size)). */
  def toNanosArray: Array[Long] = Array.tabulate(size)(nanosAtLoc)
  def toZonedDateTimeArray: Array[ZonedDateTime] = Array.tabulate(size)(dateTimeAtLoc)

  /** Sub-index covering instants in [start, end] (inclusive, nanos). */
  def sliceNanos(start: Long, end: Long): DateTimeIndex
  /** Positional sub-index over locations [from, until) — preserves
    * uniformity (a uniform islice is uniform). Requires from < until:
    * an empty index is not a representable value in this API
    * (IrregularDateTimeIndex requires at least one instant). */
  def islice(from: Int, until: Int): DateTimeIndex
  def slice(start: ZonedDateTime, end: ZonedDateTime): DateTimeIndex =
    sliceNanos(TimeUtils.toNanos(start), TimeUtils.toNanos(end))
  /** Same instants viewed in another zone. */
  def atZone(z: ZoneId): DateTimeIndex

  /** Serializable descriptor; round-trips via DateTimeIndex.parse. */
  def tag: String

  def contains(t: Long): Boolean = locAtNanos(t) >= 0
}

object TimeUtils {
  def toNanos(dt: ZonedDateTime): Long = {
    val i = dt.toInstant
    Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000000L), i.getNano.toLong)
  }
  def fromNanos(t: Long, zone: ZoneId): ZonedDateTime =
    ZonedDateTime.ofInstant(Instant.ofEpochSecond(Math.floorDiv(t, 1000000000L),
      Math.floorMod(t, 1000000000L)), zone)
  /** Nanos → java.sql.Timestamp (micros precision, as Spark stores). */
  def nanosToTimestamp(t: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(Instant.ofEpochSecond(Math.floorDiv(t, 1000000000L),
      Math.floorMod(t, 1000000000L)))
}

/**
 * start + i * frequency for i in [0, periods). O(1) space and loc<->time.
 * (capability of reference DateTimeIndex.scala:158-306, new implementation)
 */
case class UniformDateTimeIndex(
    start: ZonedDateTime, periods: Int, frequency: Frequency) extends DateTimeIndex {
  override def size: Int = periods
  override def zone: ZoneId = start.getZone
  override def dateTimeAtLoc(loc: Int): ZonedDateTime = frequency.advance(start, loc)
  override def nanosAtLoc(loc: Int): Long = TimeUtils.toNanos(dateTimeAtLoc(loc))

  override def locAtNanos(t: Long): Int = {
    val loc = locAtOrBeforeNanos(t)
    if (loc >= 0 && nanosAtLoc(loc) == t) loc else -1
  }

  override def locAtOrBeforeNanos(t: Long): Int = {
    val dt = TimeUtils.fromNanos(t, zone)
    if (t < TimeUtils.toNanos(start)) return -1
    // frequency.difference gives a near-exact guess; refine around it to be
    // robust to calendar irregularities (DST, month lengths, business days).
    var guess = math.min(frequency.difference(start, dt), periods - 1)
    while (guess < periods - 1 && nanosAtLoc(guess + 1) <= t) guess += 1
    while (guess > 0 && nanosAtLoc(guess) > t) guess -= 1
    if (nanosAtLoc(guess) > t) -1 else guess
  }

  override def locAtOrAfterNanos(t: Long): Int = {
    val before = locAtOrBeforeNanos(t)
    if (before >= 0 && nanosAtLoc(before) == t) before else before + 1
  }

  override def sliceNanos(startN: Long, endN: Long): DateTimeIndex = {
    val lo = math.max(locAtOrAfterNanos(startN), 0)
    val hi = math.min(locAtOrBeforeNanos(endN), periods - 1)
    val n = math.max(hi - lo + 1, 0)
    UniformDateTimeIndex(dateTimeAtLoc(lo), n, frequency)
  }

  override def islice(from: Int, until: Int): DateTimeIndex = {
    require(from >= 0 && until <= periods && from < until, s"bad islice [$from,$until)")
    UniformDateTimeIndex(frequency.advance(start, from), until - from, frequency)
  }

  override def atZone(z: ZoneId): DateTimeIndex =
    UniformDateTimeIndex(start.withZoneSameInstant(z), periods, frequency)

  override def tag: String =
    s"uniform,${zone.getId},${TimeUtils.toNanos(start)},$periods,${frequency.tag}"
}

/**
 * Sorted array of arbitrary instants; O(log n) lookups via binary search.
 * (capability of reference DateTimeIndex.scala:308-432, new implementation)
 */
case class IrregularDateTimeIndex(instants: Array[Long], zone: ZoneId = ZoneOffset.UTC)
    extends DateTimeIndex {
  require(instants.nonEmpty, "empty index")
  override def size: Int = instants.length
  override def dateTimeAtLoc(loc: Int): ZonedDateTime = TimeUtils.fromNanos(instants(loc), zone)
  override def nanosAtLoc(loc: Int): Long = instants(loc)

  override def locAtNanos(t: Long): Int = {
    val i = Arrays.binarySearch(instants, t)
    if (i >= 0) i else -1
  }
  override def locAtOrBeforeNanos(t: Long): Int = {
    val i = Arrays.binarySearch(instants, t)
    if (i >= 0) i else -i - 2 // insertion point - 1
  }
  override def locAtOrAfterNanos(t: Long): Int = {
    val i = Arrays.binarySearch(instants, t)
    if (i >= 0) i else -i - 1 // insertion point
  }
  override def sliceNanos(start: Long, end: Long): DateTimeIndex = {
    val lo = math.max(locAtOrAfterNanos(start), 0)
    val hi = math.min(locAtOrBeforeNanos(end), size - 1)
    IrregularDateTimeIndex(instants.slice(lo, hi + 1), zone)
  }
  override def islice(from: Int, until: Int): DateTimeIndex = {
    require(from >= 0 && until <= size && from < until, s"bad islice [$from,$until)")
    IrregularDateTimeIndex(instants.slice(from, until), zone)
  }
  override def atZone(z: ZoneId): DateTimeIndex = IrregularDateTimeIndex(instants, z)
  override def toNanosArray: Array[Long] = instants
  override def tag: String = s"irregular,${zone.getId},${instants.mkString(",")}"
  override def equals(o: Any): Boolean = o match {
    case i: IrregularDateTimeIndex => zone == i.zone && instants.sameElements(i.instants)
    case _ => false
  }
  override def hashCode(): Int = Arrays.hashCode(instants) * 31 + zone.hashCode()
}

/**
 * Ordered, disjoint concatenation of sub-indices with prefix sums + binary
 * search over segments.
 * (capability of reference DateTimeIndex.scala:434-677, new implementation)
 */
case class HybridDateTimeIndex(indices: Array[DateTimeIndex]) extends DateTimeIndex {
  require(indices.nonEmpty)
  // prefix(i) = total size of segments [0, i)
  private val prefix: Array[Long] = indices.scanLeft(0L)(_ + _.size)
  private val segStarts: Array[Long] = indices.map(_.nanosAtLoc(0))
  override def size: Int = prefix.last.toInt
  override def zone: ZoneId = indices.head.zone

  private def segmentOf(loc: Int): Int = {
    var i = Arrays.binarySearch(prefix, loc.toLong)
    if (i < 0) i = -i - 2
    math.min(i, indices.length - 1)
  }
  private def segmentOfNanos(t: Long): Int = {
    var i = Arrays.binarySearch(segStarts, t)
    if (i < 0) i = -i - 2
    i // may be -1 when t precedes everything
  }

  override def dateTimeAtLoc(loc: Int): ZonedDateTime = {
    val s = segmentOf(loc)
    indices(s).dateTimeAtLoc(loc - prefix(s).toInt)
  }
  override def nanosAtLoc(loc: Int): Long = {
    val s = segmentOf(loc)
    indices(s).nanosAtLoc(loc - prefix(s).toInt)
  }
  override def locAtNanos(t: Long): Int = {
    val s = segmentOfNanos(t)
    if (s < 0) return -1
    val l = indices(s).locAtNanos(t)
    if (l < 0) -1 else prefix(s).toInt + l
  }
  override def locAtOrBeforeNanos(t: Long): Int = {
    val s = segmentOfNanos(t)
    if (s < 0) return -1
    val l = indices(s).locAtOrBeforeNanos(t)
    if (l < 0) prefix(s).toInt - 1 else prefix(s).toInt + l
  }
  override def locAtOrAfterNanos(t: Long): Int = {
    val s = segmentOfNanos(t)
    if (s < 0) return 0
    val l = indices(s).locAtOrAfterNanos(t)
    if (l >= indices(s).size) prefix(s + 1).toInt else prefix(s).toInt + l
  }
  override def sliceNanos(start: Long, end: Long): DateTimeIndex = {
    val kept = indices.flatMap { ix =>
      val lo = ix.nanosAtLoc(0); val hi = ix.nanosAtLoc(ix.size - 1)
      if (hi < start || lo > end) None
      else Some(ix.sliceNanos(math.max(lo, start), math.min(hi, end)))
    }.filter(_.size > 0)
    if (kept.length == 1) kept(0) else HybridDateTimeIndex(kept)
  }
  override def islice(from: Int, until: Int): DateTimeIndex = {
    require(from >= 0 && until <= size && from < until, s"bad islice [$from,$until)")
    val kept = indices.indices.flatMap { i =>
      val lo = math.max(from, prefix(i).toInt)
      val hi = math.min(until, prefix(i + 1).toInt)
      if (lo < hi) Some(indices(i).islice(lo - prefix(i).toInt, hi - prefix(i).toInt))
      else None
    }.toArray
    if (kept.length == 1) kept(0) else HybridDateTimeIndex(kept)
  }
  override def atZone(z: ZoneId): DateTimeIndex = HybridDateTimeIndex(indices.map(_.atZone(z)))
  override def tag: String = indices.map(_.tag).mkString("hybrid;", ";", "")
  override def equals(o: Any): Boolean = o match {
    case h: HybridDateTimeIndex => indices.sameElements(h.indices)
    case _ => false
  }
  override def hashCode(): Int = Arrays.hashCode(indices.asInstanceOf[Array[AnyRef]])
}

object DateTimeIndex {
  def uniform(start: ZonedDateTime, periods: Int, frequency: Frequency): UniformDateTimeIndex =
    UniformDateTimeIndex(start, periods, frequency)
  def uniformFromInterval(start: ZonedDateTime, end: ZonedDateTime,
      frequency: Frequency): UniformDateTimeIndex =
    UniformDateTimeIndex(start, frequency.difference(start, end) + 1, frequency)
  def irregular(instants: Array[Long], zone: ZoneId = ZoneOffset.UTC): IrregularDateTimeIndex =
    IrregularDateTimeIndex(instants, zone)
  def irregular(instants: Seq[ZonedDateTime]): IrregularDateTimeIndex = {
    require(instants.nonEmpty)
    IrregularDateTimeIndex(instants.map(TimeUtils.toNanos).toArray, instants.head.getZone)
  }
  def hybrid(indices: Array[DateTimeIndex]): HybridDateTimeIndex = HybridDateTimeIndex(indices)

  /**
   * Union N indices into one sorted-distinct index that PRESERVES uniform
   * runs (reference semantics: DateTimeIndexUtils.scala:114-153). Disjoint
   * inputs become a hybrid of the original segments; overlaps are resolved
   * by a (first, size)-ordered sweep that bulk-drops instants the emitted
   * run already holds and splits a covering segment at the interleave
   * point. Memory stays O(segments), never O(total periods): a union of
   * multi-year daily calendars is a handful of (start, periods, freq)
   * descriptors, not millions of longs on the driver.
   *
   * After the sweep, [[coalesceSegments]] flattens adjacent irregular or
   * singleton fragments into one irregular segment (the reference's
   * simplify rule) and additionally merges exactly-contiguous
   * same-frequency uniform neighbors — an improvement the reference lacks.
   */
  def union(indices: Seq[DateTimeIndex]): DateTimeIndex = {
    require(indices.nonEmpty, "union of no indices")
    def flat(ix: DateTimeIndex): Seq[DateTimeIndex] = ix match {
      case h: HybridDateTimeIndex => h.indices.toSeq.flatMap(flat)
      case other if other.size > 0 => Seq(other)
      case _ => Seq.empty
    }
    val ord = Ordering.by((ix: DateTimeIndex) => (ix.nanosAtLoc(0), ix.size.toLong))
    val pending = collection.mutable.PriorityQueue.empty[DateTimeIndex](ord.reverse)
    indices.flatMap(flat).foreach(pending.enqueue(_))
    require(pending.nonEmpty, "union of empty indices")
    val done = collection.mutable.ArrayBuffer[DateTimeIndex](pending.dequeue())
    while (pending.nonEmpty) {
      val tail = done.remove(done.length - 1) // latest emitted; tail.first <= next.first
      val next = pending.dequeue()
      var drop = 0 // leading instants of next that tail already holds
      while (drop < next.size && tail.contains(next.nanosAtLoc(drop))) drop += 1
      if (drop > 0) {
        // next shrank, so its sort position may have changed — requeue
        done += tail
        if (drop < next.size) pending.enqueue(next.islice(drop, next.size))
      } else {
        val cut = tail.locAtOrAfterNanos(next.nanosAtLoc(0))
        if (cut < tail.size) {
          // next starts strictly inside tail's span: emit the part of tail
          // below next, keep the rest for later interleaving
          done += tail.islice(0, cut)
          done += next
          pending.enqueue(tail.islice(cut, tail.size))
        } else {
          done += tail
          done += next
        }
      }
    }
    val merged = coalesceSegments(done.toSeq)
    if (merged.length == 1) merged.head else HybridDateTimeIndex(merged.toArray)
  }

  /** Coalesce a sorted, disjoint segment run: adjacent irregular/singleton
    * segments flatten into one irregular; uniform neighbors with the same
    * frequency whose second starts exactly one period after the first ends
    * merge into one uniform. */
  private def coalesceSegments(segs: Seq[DateTimeIndex]): Seq[DateTimeIndex] = {
    def loose(ix: DateTimeIndex) =
      ix.size == 1 || ix.isInstanceOf[IrregularDateTimeIndex]
    val out = collection.mutable.ArrayBuffer.empty[DateTimeIndex]
    segs.foreach { s =>
      (out.lastOption, s) match {
        case (Some(p: UniformDateTimeIndex), u: UniformDateTimeIndex)
            if p.frequency == u.frequency &&
              TimeUtils.toNanos(p.frequency.advance(p.start, p.periods)) ==
                u.nanosAtLoc(0) =>
          out(out.length - 1) = UniformDateTimeIndex(p.start,
            p.periods + u.periods, p.frequency)
        case (Some(p), cur) if loose(p) && loose(cur) =>
          out(out.length - 1) =
            IrregularDateTimeIndex(p.toNanosArray ++ cur.toNanosArray, p.zone)
        case _ => out += s
      }
    }
    out.toSeq
  }

  /** Parse a [[DateTimeIndex.tag]]. */
  def parse(s: String): DateTimeIndex = {
    if (s.startsWith("hybrid;")) {
      return HybridDateTimeIndex(s.stripPrefix("hybrid;").split(";").map(parse))
    }
    val parts = s.split(",")
    parts(0) match {
      case "uniform" =>
        val zone = ZoneId.of(parts(1))
        UniformDateTimeIndex(TimeUtils.fromNanos(parts(2).toLong, zone), parts(3).toInt,
          Frequency.parse(parts(4)))
      case "irregular" =>
        IrregularDateTimeIndex(parts.drop(2).map(_.toLong), ZoneId.of(parts(1)))
      case other => throw new IllegalArgumentException(s"bad index tag: $other")
    }
  }
}
