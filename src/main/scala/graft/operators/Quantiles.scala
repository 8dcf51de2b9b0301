package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles as a distributed histogram plan.
  *
  * Spark's builtin `percentile` aggregate collects a value→count map
  * per group into ONE aggregation buffer (ObjectHashAggregate) — exact,
  * but the buffer grows with the group's value cardinality and the
  * whole map is serialized between partial and final aggregation. On a
  * quantized measure (here: money in integer cents) the scale-correct
  * shape is a VALUE HISTOGRAM: `groupBy(key, value).count()` is
  * map-side-combinable and its size is bounded by the value domain,
  * not the row count; cumulative counts over the per-key sorted
  * histogram give each distinct value its global rank range
  * [cum_start, cum_end); the percentile then reads at most two
  * histogram rows per requested p. 100 TB of lineitem stays a ~10⁷-row
  * histogram, and no executor ever holds more than its partition of
  * it.
  *
  * Interpolation is type-7 (pos = p·(n−1), linear between the two
  * bracketing order statistics) — identical to Spark `percentile` and
  * DuckDB `quantile_cont`, which is what the a3 oracle compares
  * against; QuantilesSpec asserts equality with the builtin on every
  * requested p including the p=0/p=1 edges.
  */
object Quantiles {

  /** Exact percentiles of `valueCol` per `keyCol` for each (name, p);
    * output: one row per key with a double column per name. Null
    * values are ignored, matching the builtin (a null would otherwise
    * occupy rank 0 of its key and shift every position); a key whose
    * values are ALL null disappears from the output, where the builtin
    * yields a null-valued row — the one documented divergence. */
  def exactPercentiles(df: DataFrame, keyCol: String, valueCol: String,
                       ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty, "exactPercentiles: at least one percentile required")
    // working columns carry a reserved prefix (the __salt convention):
    // bare names like "v"/"n" would silently collide with user columns
    // — withColumn("n", ...) REPLACES an existing "n", corrupting the
    // grouping when keyCol == "n"
    val V = "__q_v"; val CNT = "__q_cnt"; val N = "__q_n"
    val CS = "__q_cum_start"; val CE = "__q_cum_end"
    // filter on the CAST value: a non-null input that casts to null
    // (e.g. an uncastable string) would otherwise re-introduce the
    // rank-0 null shift this filter exists to prevent
    val hist = df.filter(col(valueCol).cast("double").isNotNull)
      .groupBy(col(keyCol), col(valueCol).cast("double").as(V))
      .agg(count(lit(1)).as(CNT))
    // cumulative window per key runs over the HISTOGRAM (distinct
    // values), not the rows; cum_start = 0-indexed rank of the first
    // occurrence of v in the key's sorted value sequence. The key's
    // total row count n rides an unbounded frame over the SAME window
    // partition — no second scan, no totals join
    val w = Window.partitionBy(keyCol).orderBy(col(V))
    val wAll = Window.partitionBy(keyCol)
    val joined = hist
      .withColumn(CE, sum(col(CNT)).over(w))
      .withColumn(CS, col(CE) - col(CNT))
      .withColumn(N, sum(col(CNT)).over(wAll))
    // per p: the two bracketing order statistics lo=floor(pos),
    // hi=ceil(pos) each live in exactly one histogram row — pick them
    // with a conditional max (all other rows contribute null)
    val aggExprs = ps.flatMap { case (name, p) =>
      val pos = (col(N) - 1) * p
      val lo = floor(pos)
      val hi = ceil(pos)
      Seq(
        max(when(col(CS) <= lo && lo < col(CE), col(V)))
          .as(s"__q_${name}_lo"),
        max(when(col(CS) <= hi && hi < col(CE), col(V)))
          .as(s"__q_${name}_hi"),
        max(pos - lo).as(s"__q_${name}_frac")) // constant per key (depends on n only)
    }
    val picked = joined.groupBy(col(keyCol))
      .agg(aggExprs.head, aggExprs.tail: _*)
    ps.foldLeft(picked) { case (acc, (name, _)) =>
      acc.withColumn(name,
          col(s"__q_${name}_lo") +
            col(s"__q_${name}_frac") *
              (col(s"__q_${name}_hi") - col(s"__q_${name}_lo")))
        .drop(s"__q_${name}_lo", s"__q_${name}_hi", s"__q_${name}_frac")
    }
  }
}
