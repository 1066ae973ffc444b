package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.Tables
import graft.ts.Skew

class ExtensionsAndSkewSpec extends AnyFunSuite with Matchers
    with graft.SparkTestSession {

  test("GraftExtensions registers rolling_hash for SQL") {
    // withExtensions only applies when a NEW SparkSession is built, so
    // detach the shared session, build a fresh one over the same context,
    // and restore afterwards
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = Tables.configure(SparkSession.builder()
        .master("local[2]").appName("graft-ext-test")
        .withExtensions(new GraftExtensions), "2")
        .getOrCreate()
      import ext.implicits._
      Seq("hello").toDF("t").createOrReplaceTempView("tv")
      val viaSql = ext.sql("SELECT rolling_hash(t) AS h FROM tv").collect()(0).getLong(0)
      val expected = "hello".getBytes("UTF-8")
        .foldLeft(0L)((h, b) => h * graft.text.RollingHash.Base + (b & 0xff))
      viaSql shouldBe expected
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }

  test("SQL function surface: fingerprint/tokens/simhash/hamming/cosine") {
    val spark = this.spark // shared session registers GraftExtensions via conf
    import spark.implicits._
    Seq(("The  Quick Fox!", Seq(1.0, 0.0), Seq(1.0, 1.0)))
      .toDF("t", "va", "vb").createOrReplaceTempView("fx")
    val row = spark.sql(
      """SELECT canonical_fingerprint(t) AS fp, bpeish_token_count(t) AS n,
                simhash64(t) AS sh, hamming64(simhash64(t), simhash64(t)) AS hd,
                cosine_similarity(va, vb) AS cos
         FROM fx""").collect()(0)
    row.getAs[String]("fp") should have length 32
    row.getAs[Long]("n") shouldBe 4L // The / Quick / Fox / !
    row.getAs[Long]("hd") shouldBe 0L
    row.getAs[Double]("cos") shouldBe (1.0 / math.sqrt(2)) +- 1e-12
  }

  test("bucketed tables join without an exchange") {
    val spark = this.spark
    import spark.implicits._
    import graft.io.TimeSeriesIO
    val obs = (1 to 400).map(i => ("k" + (i % 20), i.toLong, i.toDouble))
      .toDF("key", "ts_nanos", "value")
    val dims = (0 until 20).map(i => ("k" + i, s"name$i")).toDF("key", "name")
    TimeSeriesIO.writeBucketedObservations(obs, "obs_bucketed", 4)
    TimeSeriesIO.writeBucketedObservations(dims, "dims_bucketed", 4,
      key = "key", ts = "name")
    try {
      // co-located join: both sides bucketed on the join key with the same
      // bucket count — the plan must contain no shuffle exchange at all
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = TimeSeriesIO.readBucketedObservations(spark, "obs_bucketed")
        .join(TimeSeriesIO.readBucketedObservations(spark, "dims_bucketed"), "key")
      val physical = joined.queryExecution.executedPlan.toString
      physical should not include "Exchange"
      joined.count() shouldBe 400L
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("saltedJoin matches a plain join under a hot key") {
    val spark = this.spark
    import spark.implicits._
    val big = (1 to 1000).map(i => (if (i % 10 == 0) "cold" + i else "hot", i))
      .toDF("key", "v")
    val small = Seq(("hot", 100), ("cold10", 7)).toDF("key", "w")
    val plain = big.join(small, Seq("key")).agg(sum($"v" * $"w")).collect()(0).getLong(0)
    val salted = Skew.saltedJoin(big, small, "key", 8)
      .agg(sum($"v" * $"w")).collect()(0).getLong(0)
    salted shouldBe plain
  }

  test("saltedAggregate equals direct aggregation") {
    val spark = this.spark
    import spark.implicits._
    val df = (1 to 5000).map(i => ("k" + (i % 3), i.toDouble)).toDF("key", "v")
    val direct = df.groupBy("key").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedAggregate(df, "key", 8,
      partial = Seq(sum("v").as("ps"), count(lit(1)).as("pn")),
      finalAgg = Seq(sum("ps").as("s"), sum("pn").as("n")))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    salted shouldBe direct
  }
}
