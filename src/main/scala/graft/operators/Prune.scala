package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.expressions

/** Scan-pruning operators: cut the rows a downstream join/shuffle ever
  * sees, the cheapest win there is at 100 TB.
  */
object Prune {

  /** Bloom-filter semi-join pre-filter — the runtime-filter shape
    * (SPARK-32268) as an explicit operator. When a fact ⋈ dim join is
    * too big to broadcast but the dim's KEY SET fits a bloom sketch,
    * filtering the fact scan through the sketch first removes most
    * non-matching rows before they are shuffled: the shuffle then
    * carries ~selectivity·|fact| rows instead of |fact|. AQE's
    * InjectRuntimeFilter does this automatically under one join; the
    * explicit form lets a pipeline build the sketch ONCE and reuse it
    * across several downstream stages (or persist it between runs).
    *
    * The sketch is a distributed aggregate (partial blooms merge
    * associatively); only the finished ~1 MB filter crosses the driver,
    * which re-enters the plan as a foldable literal — same bounded
    * driver traffic as a broadcast, 1000× smaller than the key list.
    * Probe values go through xxhash64 on both sides (the
    * InjectRuntimeFilter convention). The filter is one-sided: it can
    * pass a non-matching row (false positive — the exact join behind it
    * still decides), but NEVER drops a matching one; `bf1`'s contract
    * columns verify both properties against the exact key set.
    */
  def bloomPrefilter(fact: DataFrame, dim: DataFrame,
                     factKey: String, dimKey: String): DataFrame = {
    val bloom = dim
      .select(expressions.bloom_agg(xxhash64(col(dimKey))).as("bf"))
      .head.getAs[Array[Byte]](0)
    fact.filter(expressions.might_contain(lit(bloom), xxhash64(col(factKey))))
  }
}
