package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.core._
import graft.models.{ArrayOps, EWMAModel}

/** ScalaCheck invariants for the Spark-free layers (index algebra,
  * differencing, smoothing) — the property-based leg of the test strategy. */
object PropertySpec extends Properties("graft") {

  private val series: Gen[Array[Double]] =
    Gen.nonEmptyListOf(Gen.choose(-1e6, 1e6)).map(_.toArray)

  private def approxEq(a: Array[Double], b: Array[Double], tol: Double): Boolean =
    a.length == b.length && a.zip(b).forall { case (x, y) =>
      math.abs(x - y) <= tol + math.abs(y) * 1e-9
    }

  property("diffAtLag/inverse round-trip") =
    forAll(series, Gen.choose(1, 5)) { (x, lag) =>
      approxEq(ArrayOps.inverseDiffAtLag(ArrayOps.diffAtLag(x, lag), lag), x, 1e-6)
    }

  property("diffOfOrder/inverse round-trip") =
    forAll(series, Gen.choose(0, 3)) { (x, d) =>
      approxEq(ArrayOps.inverseDiffOfOrder(ArrayOps.diffOfOrder(x, d), d), x, 1e-4)
    }

  property("WordShingles: count, distinctness, membership") =
    forAll(Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "dog", "fox")),
      Gen.choose(1, 4)) { (toks, k) =>
      val text = toks.mkString(" ")
      val out = graft.text.WordShingles
        .compute(org.apache.spark.unsafe.types.UTF8String.fromString(text), k)
      val got = (0 until out.numElements())
        .map(i => out.getUTF8String(i).toString)
      val expect = if (toks.length < k) Seq.empty
        else toks.sliding(k).map(_.mkString(" ")).toSeq.distinct
      got == expect
    }

  property("HashedWordShingles + JaccardSortedLongs == string-set Jaccard") =
    forAll(Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "dog", "fox", "the")),
      Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "dog", "fox", "the")),
      Gen.choose(1, 4)) { (ta, tb, k) =>
      import org.apache.spark.unsafe.types.UTF8String
      def strSet(toks: List[String]): Set[String] =
        if (toks.length < k) Set.empty
        else toks.sliding(k).map(_.mkString(" ")).toSet
      def hashed(toks: List[String]) = graft.text.HashedWordShingles
        .compute(UTF8String.fromString(toks.mkString(" ")), k)
      val (sa, sb) = (strSet(ta), strSet(tb))
      val expected: Option[Double] =
        if (sa.isEmpty && sb.isEmpty) None
        else Some(sa.intersect(sb).size.toDouble / sa.union(sb).size)
      val (ha, hb) = (hashed(ta), hashed(tb))
      // sortedness (the merge precondition) and value equivalence
      val sorted = (1 until ha.numElements())
        .forall(i => ha.getLong(i - 1) < ha.getLong(i))
      val got = Option(graft.text.JaccardSortedLongs.compute(ha, hb))
        .map(_.asInstanceOf[Double])
      sorted && (got == expected)
    }

  property("DotProduct.compute-equivalent eval matches scalar math") =
    forAll(Gen.listOfN(16, Gen.choose(-100.0, 100.0)),
      Gen.listOfN(16, Gen.choose(-100.0, 100.0))) { (a, b) =>
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      val expr = graft.sim.DotProduct(
        org.apache.spark.sql.catalyst.expressions.Literal.create(a.toArray,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
        org.apache.spark.sql.catalyst.expressions.Literal.create(b.toArray,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
      val got = expr.eval(null).asInstanceOf[Double]
      // same sequential fold the expression performs
      val want = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      got == want
    }

  property("EWMA add/remove inverse") =
    forAll(series, Gen.choose(0.05, 0.95)) { (x, a) =>
      val m = EWMAModel(a)
      approxEq(m.removeTimeDependentEffects(m.addTimeDependentEffects(x)), x, 1e-6)
    }

  private val sortedInstants: Gen[Array[Long]] =
    Gen.nonEmptyListOf(Gen.choose(0L, 1000000L))
      .map(_.distinct.sorted.toArray).suchThat(_.nonEmpty)

  property("irregular locAtOrBefore/After bracket every probe") =
    forAll(sortedInstants, Gen.choose(-10L, 1000010L)) { (instants, probe) =>
      val idx = IrregularDateTimeIndex(instants)
      val before = idx.locAtOrBeforeNanos(probe)
      val after = idx.locAtOrAfterNanos(probe)
      val beforeOk = (before < 0 || instants(before) <= probe) &&
        (before + 1 >= instants.length || instants(before + 1) > probe)
      val afterOk = (after >= instants.length || instants(after) >= probe) &&
        (after - 1 < 0 || instants(after - 1) < probe)
      val hitOk = idx.locAtNanos(probe) < 0 || before == after
      beforeOk && afterOk && hitOk
    }

  property("irregular slice = in-range instants") =
    forAll(sortedInstants, Gen.choose(0L, 1000000L), Gen.choose(0L, 1000000L)) {
      (instants, a, b) =>
        val (lo, hi) = if (a <= b) (a, b) else (b, a)
        val expected = instants.filter(t => t >= lo && t <= hi)
        expected.isEmpty ||
          IrregularDateTimeIndex(instants).sliceNanos(lo, hi)
            .toNanosArray.sameElements(expected)
    }

  property("uniform index loc->time->loc identity") =
    forAll(Gen.choose(0L, 4102444800L), Gen.choose(1, 200), Gen.choose(1, 48)) {
      (startSec, periods, hours) =>
        val start = java.time.Instant.ofEpochSecond(startSec)
          .atZone(java.time.ZoneOffset.UTC)
        val idx = DateTimeIndex.uniform(start, periods, Frequency.hours(hours.toLong))
        Seq(0, periods / 2, periods - 1).forall(l => idx.locAtNanos(idx.nanosAtLoc(l)) == l)
    }

  property("business-day advance/difference inverse") =
    forAll(Gen.choose(19700, 21900), Gen.choose(1, 60)) { (epochDay, n) =>
      val bd = Frequency.businessDays(1)
      val start0 = java.time.LocalDate.ofEpochDay(epochDay.toLong)
        .atStartOfDay(java.time.ZoneOffset.UTC)
      val start = if (bd.isBusinessDay(start0)) start0 else bd.advance(start0, 1)
      val end = bd.advance(start, n)
      bd.isBusinessDay(end) && bd.difference(start, end) == n &&
        bd.advance(end, -n) == start
    }

  // r14 directive #10: the single-start example grid promoted to a forAll
  // across ALL SEVEN firstDayOfWeek starts, multi-day strides, and both
  // directions (reference Frequency.scala:143-189 / FrequencySuite.scala)
  property("business-day advance/difference inverse across all week starts") =
    forAll(Gen.choose(19700, 21900), Gen.choose(1, 60), Gen.choose(1, 7),
        Gen.choose(1, 3), Gen.oneOf(true, false)) {
      (epochDay, steps, fdow, days, forward) =>
        val bd = BusinessDayFrequency(days, fdow)
        val start0 = java.time.LocalDate.ofEpochDay(epochDay.toLong)
          .atStartOfDay(java.time.ZoneOffset.UTC)
        val start = if (bd.isBusinessDay(start0)) start0 else bd.advance(start0, 1)
        val n = if (forward) steps else -steps
        val end = bd.advance(start, n)
        bd.isBusinessDay(end) && bd.difference(start, end) == n &&
          bd.advance(end, -n) == start
    }

  property("index tag codec round-trips") =
    forAll(sortedInstants) { instants =>
      val idx = IrregularDateTimeIndex(instants)
      DateTimeIndex.parse(idx.tag) == idx
    }

  // G = MᵀM + εI is SPD for any M; the pivoted solve must invert it exactly
  private val solveSystem: Gen[(Array[Array[Double]], Array[Array[Double]])] =
    for {
      m <- Gen.choose(1, 6)
      n <- Gen.choose(1, 3)
      rows <- Gen.choose(m, m + 4)
      mat <- Gen.listOfN(rows * m, Gen.choose(-10.0, 10.0)).map(_.toArray)
      xs <- Gen.listOfN(m * n, Gen.choose(-5.0, 5.0)).map(_.toArray)
    } yield {
      val g = Array.ofDim[Double](m, m)
      for (i <- 0 until m; j <- 0 until m) {
        var s = if (i == j) 1e-3 else 0.0
        for (r <- 0 until rows) s += mat(r * m + i) * mat(r * m + j)
        g(i)(j) = s
      }
      val x = Array.tabulate(m, n)((i, j) => xs(i * n + j))
      (g, x)
    }

  // ---- DateTimeIndex.union: the segment-preserving sweep must equal the
  // brute-force sorted-distinct union of the instants, for ANY mix of
  // uniform/irregular segments at any overlap, and every coalesced
  // segment run must be sorted and internally disjoint ----
  private val genIndex: Gen[DateTimeIndex] = Gen.oneOf(
    for {
      start <- Gen.choose(0L, 200L)
      n <- Gen.choose(1, 30)
      stepDays <- Gen.choose(1, 3)
    } yield DateTimeIndex.uniform(
      java.time.LocalDate.ofEpochDay(start).atStartOfDay(java.time.ZoneOffset.UTC),
      n, Frequency.days(stepDays)),
    for {
      days <- Gen.nonEmptyListOf(Gen.choose(0L, 400L))
    } yield DateTimeIndex.irregular(days.distinct.sorted.map(d =>
      java.time.LocalDate.ofEpochDay(d).atStartOfDay(java.time.ZoneOffset.UTC)
        .toInstant.toEpochMilli * 1000000L).toArray))

  property("union equals brute-force sorted-distinct for any segment mix") =
    forAll(Gen.nonEmptyListOf(genIndex).map(_.take(5))) { ixs =>
      val u = DateTimeIndex.union(ixs)
      val want = ixs.flatMap(_.toNanosArray).distinct.sorted
      u.toNanosArray.toSeq == want
    }

  property("union islice agrees with array slicing") =
    forAll(Gen.nonEmptyListOf(genIndex).map(_.take(4)),
      Gen.choose(0, 10), Gen.choose(1, 10)) { (ixs, a, b) =>
      val u = DateTimeIndex.union(ixs)
      val lo = math.min(a, u.size - 1)
      val hi = math.min(lo + b, u.size)
      u.islice(lo, hi).toNanosArray.toSeq == u.toNanosArray.slice(lo, hi).toSeq
    }

  property("VectorAR solve inverts planted SPD systems") =
    forAll(solveSystem) { case (g, xTrue) =>
      val m = g.length; val n = xTrue(0).length
      val b = Array.ofDim[Double](m, n)
      for (i <- 0 until m; j <- 0 until n; k <- 0 until m)
        b(i)(j) += g(i)(k) * xTrue(k)(j)
      graft.models.VectorAR.solve(g.map(_.clone), b) match {
        case Some(x) =>
          (0 until m).forall(i => (0 until n).forall { j =>
            // relative tolerance scaled by the system's magnitude: the
            // epsilon ridge keeps G invertible but near-singular draws
            // legitimately amplify error
            math.abs(x(i)(j) - xTrue(i)(j)) <=
              1e-4 * math.max(1.0, xTrue.flatten.map(math.abs).max)
          })
        case None => false
      }
    }
}
