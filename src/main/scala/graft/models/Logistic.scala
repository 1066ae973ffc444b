package graft.models

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * Distributed logistic regression by Newton–Raphson (equivalently IRLS) —
 * the model-based quality-classifier primitive (C4/CCNet-style: train a
 * discriminator of a curated slice vs the crawl, keep documents the model
 * scores as curated-like; also the general GLM fit the reference's
 * model zoo lacks).
 *
 * Scale shape: one corpus pass per Newton iteration (≤ `maxIter`, early
 * stop on the step norm). Each pass computes the (k+1)² Gram X'WX and
 * the (k+1) score X'(y−p) as per-partition partials — O(k²) memory per
 * task, k = feature count, independent of row count — which are combined
 * on the driver IN PARTITION ORDER (sorted by partition id), so the fit
 * is bit-deterministic for a fixed input layout, not just convergent.
 * The local solve reuses [[VectorAR.solve]] (pivoted Gaussian
 * elimination); a singular system (complete separation, collinear
 * features) stops the iteration at the last well-defined estimate
 * rather than fabricating a step.
 */
object Logistic {

  /** Long-format fit row: term = "intercept" or a feature column name. */
  case class LogitCoef(term: String, coef: Double, iter: Int,
      converged: Boolean)

  /**
   * Fit P(label=1 | x) = sigmoid(β₀ + β·x) over numeric feature columns.
   * Returns one row per term (intercept first), with the iteration count
   * and convergence flag on every row.
   */
  def logisticFit(df: DataFrame, labelCol: String,
      featureCols: Seq[String], maxIter: Int = 25,
      tol: Double = 1e-8, l2: Double = 0.0): DataFrame = {
    require(featureCols.nonEmpty, "featureCols must be non-empty")
    require(l2 >= 0.0, "l2 >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    val k = featureCols.length + 1
    val rows = df.select(
        array((lit(1.0) +: featureCols.map(c => col(c).cast("double"))): _*)
          .as("x"),
        col(labelCol).cast("double").as("y"))
      .filter(col("y").isNotNull &&
        !exists(col("x"), v => v.isNull || isnan(v)))
      .as[(Seq[Double], Double)]
      .map(t => (t._1.toArray, t._2))
    rows.persist()
    try {
      var beta = new Array[Double](k)
      var iter = 0
      var converged = false
      while (iter < maxIter && !converged) {
        val bc = spark.sparkContext.broadcast(beta)
        val partials = rows.mapPartitions { it =>
          val b = bc.value
          val g = new Array[Double](k * k)
          val s = new Array[Double](k)
          it.foreach { case (x, y) =>
            var eta = 0.0
            var i = 0
            while (i < k) { eta += b(i) * x(i); i += 1 }
            val p = 1.0 / (1.0 + math.exp(-eta))
            // weight clamp keeps X'WX well-conditioned as p saturates
            val w = math.max(p * (1.0 - p), 1e-10)
            val r = y - p
            i = 0
            while (i < k) {
              s(i) += r * x(i)
              var j = 0
              while (j < k) { g(i * k + j) += w * x(i) * x(j); j += 1 }
              i += 1
            }
          }
          Iterator.single((TaskContext.getPartitionId(), g, s))
        }.collect().sortBy(_._1) // deterministic combine order
        val gSum = new Array[Double](k * k)
        val sSum = new Array[Double](k)
        partials.foreach { case (_, g, s) =>
          var i = 0
          while (i < k * k) { gSum(i) += g(i); i += 1 }
          i = 0
          while (i < k) { sSum(i) += s(i); i += 1 }
        }
        // optional ridge (intercept unpenalized): keeps the Newton system
        // PD under complete separation, where the unpenalized MLE diverges
        val gm = Array.tabulate(k, k)((i, j) =>
          gSum(i * k + j) + (if (i == j && i > 0) l2 else 0.0))
        val sm = Array.tabulate(k, 1)((i, _) =>
          sSum(i) - (if (i > 0) l2 * beta(i) else 0.0))
        VectorAR.solve(gm, sm) match {
          case Some(delta) =>
            var mx = 0.0
            var i = 0
            while (i < k) {
              beta(i) += delta(i)(0)
              val a = math.abs(delta(i)(0)); if (a > mx) mx = a
              i += 1
            }
            iter += 1
            if (mx < tol) converged = true
          case None =>
            // singular (separation / collinearity): stop at the last
            // well-defined estimate, never a fabricated step
            iter = maxIter
        }
      }
      val names = "intercept" +: featureCols
      names.zipWithIndex.map { case (nm, i) =>
        LogitCoef(nm, beta(i), iter, converged)
      }.toDF()
    } finally rows.unpersist(false)
  }

  /**
   * Binary-classifier evaluation in ONE bounded pass: Brier score,
   * accuracy at 0.5, and the bucketed AUC — scores quantized to
   * `buckets` levels (floor(score·buckets), clamped), ranks computed
   * over the BUCKET histogram with the standard tie adjustment
   * (ties contribute half), so the whole computation is one keyed
   * aggregate over ≤ buckets+1 rows plus a window over that bounded
   * histogram — never a global sort of the corpus. At 1000 buckets the
   * quantization error on AUC is < 1e-3 for any score distribution;
   * exact-tie semantics make the number engine-reproducible (the DuckDB
   * oracle replays the same histogram).
   */
  def binaryMetrics(df: DataFrame, labelCol: String = "label",
      scoreCol: String = "score", buckets: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets >= 2, "buckets >= 2")
    val y = col(labelCol).cast("double")
    val s = col(scoreCol).cast("double")
    // clamp both ends: scores outside [0,1) would otherwise produce
    // negative bucket ids (below) or bucket == buckets (at exactly 1.0)
    val base = df.select(
      greatest(least(floor(s * buckets), lit(buckets - 1)), lit(0L))
        .cast("long").as("__b"),
      y.as("__y"), s.as("__s"))
    val agg = base.agg(
      count(lit(1)).as("n"),
      sum(col("__y")).as("n_pos"),
      avg(pow(col("__s") - col("__y"), 2)).as("brier"),
      avg(when((col("__s") >= 0.5) === (col("__y") === 1.0), 1.0)
        .otherwise(0.0)).as("accuracy"))
    val hist = base.groupBy(col("__b")).agg(
      sum(col("__y")).as("p"), sum(lit(1.0) - col("__y")).as("ng"))
    val w = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val auc = hist
      .withColumn("__cumneg", coalesce(sum(col("ng")).over(w), lit(0.0)))
      .agg(sum(col("p") * (col("__cumneg") + col("ng") / 2)).as("__u"),
        sum(col("p")).as("__np"), sum(col("ng")).as("__nn"))
      // single-class input has no pos/neg pairs to rank: AUC is undefined —
      // return an explicit null instead of a divide-by-zero null-with-
      // surprise (documented: auc IS NULL iff the input is single-class)
      .select(when(col("__np") > 0 && col("__nn") > 0,
        col("__u") / (col("__np") * col("__nn"))).as("auc"))
    agg.crossJoin(auc)
      .select(col("n"), col("n_pos").cast("long").as("n_pos"),
        round(col("auc"), 6).as("auc"), round(col("brier"), 6).as("brier"),
        round(col("accuracy"), 6).as("accuracy"))
  }

  /** Apply a [[logisticFit]] coefficient table: adds `score` =
    * sigmoid(β₀ + β·x). Coefficients are collected (k+1 rows — bounded)
    * and folded into one codegen'd column expression — no join, no UDF. */
  def logisticScore(df: DataFrame, coefs: DataFrame,
      featureCols: Seq[String], scoreCol: String = "score"): DataFrame = {
    val m = coefs.select(col("term"), col("coef")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val eta = featureCols.foldLeft(lit(m("intercept"))) { (acc, c) =>
      acc + lit(m(c)) * col(c).cast("double")
    }
    df.withColumn(scoreCol, lit(1.0) / (lit(1.0) + exp(-eta)))
  }
}
