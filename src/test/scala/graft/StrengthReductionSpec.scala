package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{Collect, AggregateExpression}
import org.apache.spark.sql.catalyst.plans.logical.Aggregate

/** [[graft.plans.CollectStrengthReduction]]: scalar consumers of
  * collect_list/collect_set become constant-memory aggregates; an
  * exists-only array build is pruned away entirely. Verified on a
  * session built through the real deployment path
  * (`SparkSession.builder.withExtensions(new GraftExtensions)`), with
  * result equality against the un-extended shared session.
  */
class StrengthReductionSpec extends SparkSpec {

  // second session on the SAME SparkContext, with the extensions
  // installed the way a cluster would (spark.sql.extensions)
  private lazy val ext: SparkSession = {
    spark.sparkContext // ensure the context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    SparkSession.setDefaultSession(spark)
    SparkSession.setActiveSession(spark)
    s
  }

  private def hasCollect(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case a: Aggregate => a.aggregateExpressions.exists(_.exists {
        case AggregateExpression(_: Collect[_], _, _, _, _) => true
        case _ => false
      })
    }.exists(identity)

  private def objHash(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("ObjectHashAggregate")

  test("size/min/max/contains over collect_list reduce to count/min/max/flag") {
    val naive = ext.read.parquet(s"$sf/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(size(collect_list(col("l_quantity"))).as("n"),
        array_min(collect_list(col("l_quantity"))).as("mn"),
        array_max(collect_list(col("l_quantity"))).as("mx"),
        array_contains(collect_list(col("l_linestatus")), "F").as("has_f"),
        size(collect_set(col("l_linestatus"))).as("n_status"))
    assert(!hasCollect(naive), "every collect should be rewritten away")
    assert(!objHash(naive), "plan must be a codegen'd HashAggregate")

    val plain = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(count(col("l_quantity")).cast("int").as("n"),
        min(col("l_quantity")).as("mn"),
        max(col("l_quantity")).as("mx"),
        max(coalesce(col("l_linestatus") === "F", lit(false))).as("has_f"),
        countDistinct(col("l_linestatus")).cast("int").as("n_status"))
    assert(naive.orderBy("l_returnflag").collect().toSeq ==
      plain.orderBy("l_returnflag").collect().toSeq)
  }

  test("array kept when genuinely consumed; mixed consumers keep one collect") {
    val df = ext.read.parquet(s"$sf/lineitem.parquet")
      .groupBy(col("l_orderkey"))
      .agg(collect_list(col("l_quantity")).as("qs"),
        size(collect_list(col("l_quantity"))).as("n"))
    assert(hasCollect(df), "the array output itself must survive")
    val r = df.filter(col("l_orderkey") === 1L).head()
    assert(r.getSeq[Double](r.fieldIndex("qs")).length == r.getAs[Int]("n"))
  }

  test("exists-only filter loses the whole array build (flag + pruning)") {
    val naive = ext.read.parquet(s"$sf/lineitem.parquet")
      .groupBy(col("l_orderkey"))
      .agg(collect_list(struct(col("l_linenumber").as("ln"),
          col("l_returnflag").as("rf"))).as("items"),
        sum(col("l_quantity")).as("qty"))
      .filter(exists(col("items"), i => i.getField("rf") === "R"))
      .select(col("l_orderkey"), col("qty"))
    assert(!hasCollect(naive),
      "exists was the array's only consumer — the collect must be pruned")

    val expected = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("qty"),
        max(col("l_returnflag") === "R").as("m"))
      .filter(col("m")).select(col("l_orderkey"), col("qty"))
    assert(naive.orderBy("l_orderkey").collect().toSeq ==
      expected.orderBy("l_orderkey").collect().toSeq)
  }

  test("exists through sort_array + transform wrappers composes the element") {
    val naive = ext.read.parquet(s"$sf/lineitem.parquet")
      .groupBy(col("l_orderkey"))
      .agg(transform(
          sort_array(collect_list(struct(col("l_linenumber").as("seq"),
            col("l_returnflag").as("rf")))),
          s => struct(s.getField("rf").as("rf"))).as("items"))
      .filter(exists(col("items"), i => i.getField("rf") === "A"))
      .select(col("l_orderkey"))
    assert(!hasCollect(naive))
    val expected = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === "A")
      .select(col("l_orderkey")).distinct()
    assert(naive.orderBy("l_orderkey").collect().toSeq ==
      expected.orderBy("l_orderkey").collect().toSeq)
  }

  test("no rewrite when the exists predicate references another agg output") {
    val df = ext.read.parquet(s"$sf/lineitem.parquet")
      .groupBy(col("l_orderkey"))
      .agg(collect_list(col("l_quantity")).as("qs"),
        avg(col("l_quantity")).as("m"))
      .filter(exists(col("qs"), q => q > col("m")))
    assert(hasCollect(df), "predicate closes over an agg output — unsafe to move")
    assert(df.count() > 0)
  }

  test("opt1 gated query runs reduced on the plain session via extraOptimizations") {
    val df = SparkEntry.queries("opt1_agg_rewrite")(spark, sf)
    assert(!hasCollect(df))
    assert(!objHash(df))
  }

  test("size through a null-producing or non-injective transform stays exact") {
    import ext.implicits._
    val df = Seq((1, 5), (1, 6)).toDF("k", "x")
      .groupBy(col("k"))
      .agg(
        // lambda maps 5 -> null: size counts it, count(el') would not
        size(transform(collect_list(col("x")),
          u => when(u === 5, lit(null)).otherwise(u))).as("n"),
        // non-injective lambda AFTER set-dedup: still 2 elements
        size(transform(collect_set(col("x")), u => u * 0)).as("n_set"))
    assert(!hasCollect(df))
    val r = df.head()
    assert(r.getAs[Int]("n") == 2)
    assert(r.getAs[Int]("n_set") == 2)
  }

  test("contains is NOT rewritten through a null-producing transform (NULL-on-miss)") {
    import ext.implicits._
    val df = Seq((1, 5), (1, 6)).toDF("k", "x")
      .groupBy(col("k"))
      .agg(array_contains(transform(collect_list(col("x")),
        u => when(u === 5, lit(null)).otherwise(u)), 99).as("hit"))
    // the transformed array is [null, 6]; real semantics: miss + null
    // element => NULL. The rule must leave this shape alone.
    val r = df.head()
    assert(r.isNullAt(r.fieldIndex("hit")))
  }

  test("null inputs dropped by collect never satisfy a rewritten exists") {
    import ext.implicits._
    // collect_list drops the null x before the array exists, so
    // exists(xs, isNull) is ALWAYS false on the real array; the flag
    // must not resurrect the dropped row
    val df = Seq((1, Option(5)), (1, None)).toDF("k", "x")
      .groupBy(col("k"))
      .agg(collect_list(col("x")).as("xs"))
      .filter(exists(col("xs"), e => e.isNull))
      .select(col("k"))
    assert(!hasCollect(df), "rewrite should still fire on nullable input")
    assert(df.count() == 0, "no array element is null — dropped rows don't count")
  }

  test("null-defaulting transform lambda cannot resurrect dropped rows (min/contains)") {
    import ext.implicits._
    // x = [null, 5]; real array after collect+transform is [5] (the
    // null was dropped BEFORE transform ran). coalesce(u, 0) makes the
    // composed element non-nullable, so the rewrite fires — it must
    // see NULL (min) / false (contains) for the dropped row, not 0
    val df = Seq((1, Option(5)), (1, None)).toDF("k", "x")
      .groupBy(col("k"))
      .agg(
        array_min(transform(collect_list(col("x")),
          u => coalesce(u, lit(0)))).as("mn"),
        array_max(transform(collect_list(col("x")),
          u => coalesce(u, lit(-99)))).as("mx"),
        array_contains(transform(collect_list(col("x")),
          u => coalesce(u, lit(0))), 0).as("has_zero"))
    assert(!hasCollect(df))
    val r = df.head()
    assert(r.getAs[Int]("mn") == 5, "min must ignore the dropped null row")
    assert(r.getAs[Int]("mx") == 5, "max must ignore the dropped null row")
    assert(!r.getAs[Boolean]("has_zero"), "dropped row must not produce a 0 element")
  }

  test("array_contains NULL probe answers NULL, not false, after rewrite") {
    import ext.implicits._
    val df = Seq((1, 10, Option(10)), (1, 20, None))
      .toDF("k", "v", "probe")
      .groupBy(col("k"), col("probe"))
      .agg(array_contains(collect_list(col("v")), col("probe")).as("hit"))
    val rows = df.collect().map(r =>
      (r.isNullAt(r.fieldIndex("probe")), r.isNullAt(r.fieldIndex("hit"))))
    assert(rows.contains((true, true)), "NULL probe must yield NULL hit")
    assert(rows.contains((false, false)))
  }
}
