package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed `percent_rank` / `cume_dist` without the low-cardinality
  * window trap.
  *
  * `Window.partitionBy(flag)` over a 3-value key funnels the whole fact
  * table through three single-task sorts — `percent_rank` needs the
  * entire partition ordered on one task, so the plan is fatal at 100 TB
  * no matter how many executors exist. This is the classic two-pass
  * distributed ranking instead:
  *
  *   1. approximate value-range boundaries (one tiny sketch aggregate,
  *      `percentile_approx`) split the ORDER key's domain into B
  *      buckets. Correctness is INVARIANT to where the boundaries land
  *      — they only balance work — so the approximation is free;
  *   2. rows rank locally within (partition key, bucket) — the only
  *      fact-size shuffle, over partKeys×B keys, each a bounded slice;
  *   3. per-(partition key, bucket) counts (map-side-combined, tiny)
  *      turn into prefix-sum offsets with a window over the B-row
  *      counts frame, broadcast back;
  *   4. global rank = bucket offset + local rank, and
  *      `pr = (rank−1)/(n−1)`, `cd = count_le/n` are arithmetic.
  *
  * Ties are handled with full SQL window semantics: within each
  * (partition key, bucket) slice, `rank()` yields the tie-group MIN
  * rank and the default RANGE frame of `count(*)` includes peers
  * (rows equal on ALL `orderCols`), so `pr` matches `percent_rank()`
  * and `cume` matches `cume_dist()` exactly — tie groups never span
  * buckets because the bucket is a function of the leading order
  * value. Both local windows share one shuffle+sort. Verified against
  * the single-partition window oracle on tie-heavy data in
  * PropertySpec ("two-pass rank matches window semantics under
  * ties").
  */
object Rank {

  /** Adds `pr` and `cume` columns ranking within `partCols` ordered by
    * `orderCols` (total order; head column drives the range bucketing). */
  def percentRank(df: DataFrame, partCols: Seq[String],
                  orderCols: Seq[String], buckets: Int = 64): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val v = orderCols.head
    // B-1 approximate split points of the leading order column. Rows
    // with equal v always map to the same bucket (bucket is a function
    // of v), so bucket ranges respect the value order exactly. The
    // B-1 doubles are a BOUNDED driver-side collect (the k-means-
    // sample discipline): inlining them as literals keeps the bucket
    // computation inside whole-stage codegen — the higher-order
    // `filter(bounds, b -> b <= v)` alternative is CodegenFallback and
    // measured ~15× slower per scan at sf0.1.
    // percentile_approx over zero rows is NULL — an empty input must
    // degrade to a single bucket, not NPE on the driver; buckets = 1
    // skips the sketch entirely (an empty percentage array fails
    // analysis). Column-API percentages, not an interpolated SQL
    // string — a column name needing backticks must not break the
    // parse (round-13 review).
    val boundsArr: Seq[Double] =
      if (buckets < 2) Seq.empty
      else Option(df
        .agg(percentile_approx(col(v).cast("double"),
          array((1 until buckets).map(i => lit(i.toDouble / buckets)): _*),
          lit(10000)))
        .head().getSeq[Double](0)).getOrElse(Seq.empty)

    val bucketCol = boundsArr.distinct.sorted
      .map(b => when(col(v) >= lit(b), 1).otherwise(0))
      .reduceOption(_ + _).getOrElse(lit(0): Column)
    val bucketed = df.withColumn("bucket", bucketCol)

    val partB: Seq[Column] = (partCols :+ "bucket").map(col)
    val wLocal = Window.partitionBy(partB: _*)
      .orderBy(orderCols.map(col): _*)
    // rank() = tie-group min rank within the bucket; count() with the
    // default RANGE frame = rows ordered <= current INCLUDING peers
    // (the cume_dist numerator). Same partitioning+ordering → Spark
    // evaluates both in the one Window node over one shuffle.
    val local = bucketed
      .withColumn("local_rk", rank().over(wLocal))
      .withColumn("local_le", count(lit(1)).over(wLocal))

    // Tiny side: partKeys×B count rows; the prefix-sum window runs over
    // that counts frame, never the fact table.
    val counts = bucketed.groupBy(partB: _*)
      .agg(count(lit(1)).as("bucket_n"))
    val wOff = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = counts
      .withColumn("offset", sum("bucket_n").over(wOff) - col("bucket_n"))
    val nPer = counts.groupBy(partCols.map(col): _*)
      .agg(sum("bucket_n").as("part_n"))

    local
      .join(broadcast(offsets.select(partB :+ col("offset"): _*)),
        partCols :+ "bucket")
      .join(broadcast(nPer), partCols)
      .withColumn("rnk", col("offset") + col("local_rk"))
      .withColumn("cnt_le", col("offset") + col("local_le"))
      .withColumn("pr",
        when(col("part_n") > 1,
          (col("rnk") - 1).cast("double") / (col("part_n") - 1))
          .otherwise(lit(0.0)))
      .withColumn("cume", col("cnt_le").cast("double") / col("part_n"))
      .drop("bucket", "local_rk", "local_le", "offset", "rnk", "cnt_le",
        "part_n")
  }
}
