package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/**
 * Bounded-state streaming sketches — the streaming twin of
 * [[graft.sketch.Sketches]]: sketch summaries that hold their published
 * error guarantee while state stays O(capacity), no matter how many
 * distinct tokens flow past. The batch answer needs a full (token → count)
 * shuffle; an unbounded stream cannot afford that state, which is exactly
 * the problem Space-Saving solves.
 */
object StreamingSketch {

  /** One Space-Saving counter: `count` is an UPPER bound on the item's true
    * frequency within its shard; `err` is the overcount bound (the evicted
    * counter's value when this item took the slot), so
    * count − err ≤ true ≤ count. */
  case class HeavyHitter(shard: Int, token: String, count: Long, err: Long)

  /** State as parallel arrays: tuple-valued Map fields trip the product
    * encoder's codegen, and arrays serialize tighter anyway. Public —
    * encoder-generated code cannot touch a private class. */
  case class SsState(tokens: Array[String], counts: Array[Long],
      errs: Array[Long], n: Long)

  /**
   * Streaming heavy hitters via sharded Space-Saving (Metwally, Agrawal,
   * El Abbadi, "Efficient Computation of Frequent and Top-k Elements in
   * Data Streams", ICDT 2005):
   *
   *  - tokens hash-shard into `shards` groups (the same key shuffle a
   *    streaming agg needs anyway — shards process in parallel);
   *  - each shard keeps ≤ `capacity` counters in `mapGroupsWithState`:
   *    a seen token increments its counter; an unseen token beyond
   *    capacity evicts the MINIMUM counter and inherits its value as its
   *    error bound `err`;
   *  - GUARANTEE per shard: any token with true count > N_shard/capacity
   *    is in the summary (it can never be fully evicted), and every
   *    reported counter satisfies count − err ≤ true ≤ count.
   *
   * Emits the full summary of every updated shard each trigger (Update
   * mode); the global top-k is `orderBy(count desc).limit(k)` downstream —
   * k ≤ capacity·shards rows, driver-trivial. State is
   * O(shards × capacity) forever, the property that makes this the 100 TB
   * streaming design over the unbounded (token → count) aggregation.
   *
   * No reference counterpart (the reference has no streaming); pairs with
   * the batch heavy-hitter certification in qs03.
   */
  def streamingHeavyHitters(stream: DataFrame, textCol: String = "text",
      shards: Int = 8, capacity: Int = 64): Dataset[HeavyHitter] = {
    val s = stream.sparkSession
    import s.implicits._
    stream
      // same tokenizer as the batch twin (Sketches.cms / qs03) — the
      // streaming and batch heavy-hitter counts must never diverge
      .select(explode(graft.text.TextFunctions.tokens(lower(col(textCol))))
        .as("token"))
      .filter(length(col("token")) > 0)
      .select(pmod(hash(col("token")), lit(shards)).as("shard"), col("token"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[SsState, Seq[HeavyHitter]](GroupStateTimeout.NoTimeout()) {
        (shard: Int, rows: Iterator[(Int, String)], state: GroupState[SsState]) =>
          val st = state.getOption.getOrElse(
            SsState(Array.empty, Array.empty, Array.empty, 0L))
          var counts = scala.collection.mutable.LinkedHashMap.from(
            st.tokens.indices.map(i => st.tokens(i) -> ((st.counts(i), st.errs(i)))))
          var n = st.n
          rows.foreach { case (_, token) =>
            n += 1
            counts.get(token) match {
              case Some((c, e)) => counts.update(token, (c + 1, e))
              case None if counts.size < capacity =>
                counts.update(token, (1L, 0L))
              case None =>
                val min = counts.minBy { case (t, (c, _)) => (c, t) }
                val minCnt = min._2._1
                counts.remove(min._1)
                counts.update(token, (minCnt + 1, minCnt))
            }
          }
          val toks = counts.keys.toArray
          state.update(SsState(toks,
            toks.map(t => counts(t)._1), toks.map(t => counts(t)._2), n))
          toks.toSeq.map { t =>
            val (c, e) = counts(t); HeavyHitter(shard, t, c, e) }
      }
      .flatMap(identity)
  }
}
