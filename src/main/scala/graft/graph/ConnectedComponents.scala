package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Connected components over an undirected edge list — the clustering step a
 * dedup pipeline runs after LSH pair generation (pairs only say "a ~ b";
 * training-data dedup needs whole duplicate CLUSTERS so it can keep one
 * canonical document per cluster and drop the rest). The reference ships pair
 * generation but leaves grouping to the caller; at 100 TB the grouping is the
 * hard part, so it is a first-class operator here.
 *
 * Algorithm: iterative min-label propagation with pointer jumping.
 * Every vertex starts labeled with its own id; each round sets
 *   label(v) <- min(label(v), min over neighbors u of label(u))   (hash join)
 *   label(v) <- label(label(v))                                   (pointer jump)
 * The neighbor step alone needs O(diameter) rounds; the pointer jump contracts
 * label chains so convergence is O(log diameter) — near-dup clusters are
 * shallow (a hub crawl dup cluster has diameter ~2-4), so 3-6 rounds in
 * practice. Every round is two keyed shuffles (edges are re-used, labels are
 * small), and `localCheckpoint` cuts the lineage so the plan does not grow
 * with the iteration count (the classic iterative-DataFrame OOM).
 *
 * Scale notes: labels are one row per vertex — orders of magnitude smaller
 * than the corpus — and the edge list is shuffled on src once per round.
 * No step ever materializes a component in one task, so a degenerate giant
 * component (everything near-dups everything) degrades to more rounds, not
 * to an executor OOM. On a real cluster prefer `sc.setCheckpointDir` +
 * reliable checkpoints over localCheckpoint for fault tolerance.
 */
object ConnectedComponents {

  /**
   * @param vertices one column: the vertex id (LongType)
   * @param edges    two columns (src, dst); treated as undirected, self-loops
   *                 and duplicates are fine
   * @param maxIter  iteration cap; with pointer jumping 25 rounds covers any
   *                 graph of diameter < 2^25. Exhausting it means labels are
   *                 only PARTIALLY propagated — that is an error, not a
   *                 result, so `run` throws rather than silently returning
   *                 wrong components (downstream canonical election would
   *                 split clusters).
   * @return (id, component) where component = min vertex id in the component;
   *         isolated vertices keep their own id
   */
  def run(vertices: DataFrame, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val idCol = vertices.columns.head
    val Seq(srcCol, dstCol) = edges.columns.take(2).toSeq
    val sym = edges.select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    val und = sym.union(sym.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .localCheckpoint() // edges are reused every round: evaluate once

    var labels = vertices.select(col(idCol).cast("long").as("id"))
      .withColumn("comp", col("id")).localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = und.join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id")).agg(min("comp").as("nbr_min"))
      val stepped = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("comp").as("old"),
          least(col("comp"), coalesce(col("nbr_min"), col("comp"))).as("comp"))
      // pointer jump: follow comp one hop (comp <- label(comp)); labels(id)
      // always exists because comp only ever takes existing vertex ids
      val jumped = stepped.join(
          labels.select(col("id").as("comp"), col("comp").as("jump")), Seq("comp"), "left")
        .select(col("id"), col("old"),
          least(col("comp"), coalesce(col("jump"), col("comp"))).as("comp"))
        .localCheckpoint()
      converged = jumped.filter(col("comp") =!= col("old")).isEmpty
      labels = jumped.select("id", "comp")
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"ConnectedComponents did not converge within maxIter=$maxIter rounds; " +
          "labels are partially propagated. Raise maxIter (each round is two " +
          "keyed shuffles; pointer jumping needs only O(log diameter) rounds).")
    labels.withColumnRenamed("id", idCol).withColumnRenamed("comp", "component")
  }
}
