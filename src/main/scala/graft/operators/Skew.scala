package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling helpers (SURVEY.md §4 / brief "salting for skew").
  *
  * AQE's skew-join splitting covers sort-merge joins; what it does NOT
  * cover is a skewed aggregation whose per-key combine state is itself
  * expensive (e.g. `collect_list` of a hot key — one reducer holds the
  * whole array). `saltedCollect` runs such an aggregation in two
  * phases: (key, salt) partial collect → key-level merge of the salted
  * fragments. Salt fan-out trades one extra (much smaller) shuffle for
  * bounded per-task state.
  */
object Skew {

  /** Two-phase salted `collect_list(struct(...))`: phase 1 groups by
    * (key, hash(id) % salt) and collects fragments; phase 2 merges and
    * sorts per key. Result is identical to the direct aggregation
    * (verified in SkewSpec) — sort_array makes merge order irrelevant. */
  def saltedCollect(df: DataFrame, key: String, payload: Column,
                    saltCol: Column, salt: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(hash(saltCol), lit(salt)))
      .groupBy(col(key), col("__salt"))
      .agg(collect_list(payload).as("__frag"))
      .groupBy(col(key))
      .agg(sort_array(flatten(collect_list(col("__frag")))).as("items"))

  /** Two-phase salted sum/count for hot-key scalar aggregations —
    * partial combine on (key, salt), final combine on key. (Catalyst's
    * map-side partial aggregation already does this for scalar aggs;
    * provided for explicitness and for use under `collect_set`-style
    * states where it doesn't.) */
  def saltedSum(df: DataFrame, key: String, value: Column,
                saltCol: Column, salt: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(hash(saltCol), lit(salt)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(value).as("__part"), count(lit(1)).as("__n"))
      .groupBy(col(key))
      .agg(sum(col("__part")).as("total"), sum(col("__n")).as("n"))
}
