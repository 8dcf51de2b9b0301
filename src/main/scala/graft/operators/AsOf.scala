package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — for each fact row, the single dimension version in
  * effect at the fact's timestamp (latest `dimTs` ≤ `factTs` per key):
  * the SCD-2 lookup every event pipeline needs and one of the classic
  * operators Spark's join menu lacks (DuckDB ships it as `ASOF JOIN`,
  * kdb+ as `aj` — which is exactly what makes it oracle-checkable
  * here: this implementation is differentially tested against
  * DuckDB's native ASOF JOIN, not against a reimplementation).
  *
  * Implementation is the UNION-AND-WINDOW shape, not a range join:
  * dim rows and fact rows are unioned into one keyed timeline and a
  * per-key running `last(dim_payload, ignoreNulls)` window carries
  * each dim version forward to every later fact row. Cost is ONE
  * shuffle on the join key plus a per-key sort — at 100 TB that is
  * the plan you want: a non-equi range join would either
  * BroadcastNestedLoop (quadratic) or explode the fact side per dim
  * interval, and both lose the single-pass property. Window state is
  * one dim payload per key, never a buffer. Tie rule: a dim version
  * effective exactly AT the fact timestamp applies to it (dim sorts
  * before fact at equal timestamps — the `is_fact` sort key), the
  * standard inclusive as-of bound and DuckDB's `>=` semantics.
  */
object AsOf {

  /** `fact` AS-OF LEFT JOIN `dim`: every fact row, plus `payload`
    * (a struct column built over the dim attributes) from the latest
    * dim version at or before the fact's timestamp — null if the key
    * has no version yet. Both inputs may carry arbitrary extra
    * columns; fact columns pass through untouched. */
  def asofLeft(fact: DataFrame, dim: DataFrame, key: String,
               factTs: String, dimTs: String,
               payload: Column): DataFrame = {
    val factCols = fact.columns.toSeq
    // withColumn silently REPLACES same-named columns — a fact frame
    // already carrying one of the scratch names (or the output name)
    // would be corrupted instead of joined; fail loudly. "_asof" is on
    // the list because the carry window writes it — without it a fact
    // frame with its own "_asof" would be clobbered AND emitted twice
    // by the final select, exactly the corruption this guard exists
    // to prevent
    val reserved = Seq("_t", "_is_fact", "_dimv", "_asof", "asof")
    val clash = factCols.filter(reserved.contains)
    require(clash.isEmpty,
      s"asofLeft reserves column names ${reserved.mkString(", ")}; " +
        s"fact already has ${clash.mkString(", ")} — rename before joining")
    // the dim payload rides inside a one-field WRAPPER struct: the
    // carry below skips nulls to step over fact rows, and a bare
    // payload column would make a dim version whose payload VALUE is
    // null indistinguishable from a fact row — the carry would skip
    // it and resurrect the older version, where SQL ASOF (the DuckDB
    // oracle) matches the null-payload version and yields null
    // (round-13 review). struct(payload) is non-null for every dim
    // row regardless of the payload value, so only fact rows are
    // skipped; the final select unwraps.
    val pType = dim.select(payload.as("p")).schema("p").dataType
    val wrapType = org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("p", pType)))
    val f = fact
      .withColumn("_t", col(factTs))
      .withColumn("_is_fact", lit(1))
      .withColumn("_dimv", lit(null).cast(wrapType))
    val d0 = dim.select(col(key), col(dimTs).as("_t"),
      struct(payload.as("p")).as("_dimv"))
    // align schemas: dim rows carry nulls for fact columns
    val d = factCols.foldLeft(d0) { (acc, c) =>
      if (c == key) acc
      else acc.withColumn(c, lit(null).cast(fact.schema(c).dataType))
    }.withColumn("_is_fact", lit(0))
      .select((factCols ++ Seq("_t", "_is_fact", "_dimv")).map(col): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("_t"), col("_is_fact"))
      .rowsBetween(Window.unboundedPreceding, 0)
    f.select((factCols ++ Seq("_t", "_is_fact", "_dimv")).map(col): _*)
      .unionByName(d)
      .withColumn("_asof", last(col("_dimv"), ignoreNulls = true).over(w))
      .filter(col("_is_fact") === 1)
      .select(factCols.map(col) :+
        col("_asof").getField("p").as("asof"): _*)
  }

  /** RANGE join — fact rows against dimension INTERVALS
    * (`start ≤ ts < end`, a fact matching every overlapping interval),
    * via INTERVAL BUCKETING: the time axis is cut into `binSeconds`
    * bins, each dim interval explodes to the bins it covers (bounded
    * by ⌈length/bin⌉ — size `binSeconds` near the typical interval
    * length to keep this a small constant), each fact row maps to
    * exactly ONE bin, and the match becomes an EQUI-join on the bin
    * followed by the exact between-filter. This is the shape that
    * scales: Spark's planner turns a bare non-equi time predicate
    * into BroadcastNestedLoopJoin (every fact row against every
    * interval — quadratic and driver-bound), while the bucketed form
    * shuffles the fact side once on a key Catalyst can hash. The
    * exact filter makes bucketing purely an access path — results are
    * independent of `binSeconds`.
    *
    * `endInclusive = false` gives the half-open `start ≤ ts < end`
    * interval convention; `true` gives SQL's `BETWEEN` (both bounds
    * inclusive — a single-instant `start = end` interval is then
    * valid and matches exactly that instant). */
  def rangeJoin(fact: DataFrame, factTs: String, dim: DataFrame,
                startCol: String, endCol: String, payload: Column,
                binSeconds: Long, endInclusive: Boolean = false): DataFrame = {
    // same clobber guard as asofLeft: fact columns pass through, so a
    // fact frame already using a scratch name (or the payload output
    // name) would be silently replaced by withColumn/select
    val reserved = Seq("_bin", "_s", "_e", "range")
    val clash = fact.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"rangeJoin reserves column names ${reserved.mkString(", ")}; " +
        s"fact already has ${clash.mkString(", ")} — rename before joining")
    val fb = fact.withColumn("_bin",
      floor(unix_timestamp(col(factTs)) / binSeconds))
    val db = dim.select(col(startCol).as("_s"), col(endCol).as("_e"),
        payload.as("range"))
      // empty/inverted intervals produce NO bins: without this guard,
      // sequence(start > stop) generates a DESCENDING range, so one
      // malformed end-before-start row would fan out to every bin
      // between them instead of matching nothing
      .filter(if (endInclusive) col("_e") >= col("_s")
              else col("_e") > col("_s"))
      // the end bin always OVER-covers (floor of the truncated end
      // second) and the exact filter prunes: the old exclusive-end
      // `-1` refinement assumed whole-second ends — unix_timestamp
      // TRUNCATES sub-second precision, so an interval ending at
      // 10.5 s read end-bin floor(9/bin) and a fact at 10.2 s never
      // met its equi-key (round-13 review; events carry nanosecond
      // timestamps). One extra candidate bin per interval is the
      // documented price of bucketing-as-access-path; correctness
      // stays with the between-filter.
      .withColumn("_bin", explode(sequence(
        floor(unix_timestamp(col("_s")) / binSeconds),
        floor(unix_timestamp(col("_e")) / binSeconds))))
    fb.join(db, Seq("_bin"))
      .filter(col(factTs) >= col("_s") &&
        (if (endInclusive) col(factTs) <= col("_e")
         else col(factTs) < col("_e")))
      .drop("_bin", "_s", "_e")
  }
}
