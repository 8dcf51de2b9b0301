package graft

import org.apache.spark.sql.functions._
import graft.operators.Quantiles

/** The histogram percentile plan must be bit-identical to Spark's
  * builtin exact `percentile` for every p, including the p=0 / p=1
  * edges and a key whose group has a single row. */
class QuantilesSpec extends SparkSpec {

  private val ps = Seq("p0" -> 0.0, "p25" -> 0.25, "med" -> 0.5,
    "p90" -> 0.9, "p95" -> 0.95, "p100" -> 1.0)

  test("histogram percentiles equal builtin percentile on lineitem") {
    val li = Tables.lineitem(spark, sf)
      .withColumn("price_c", round(col("l_extendedprice") * 100, 0))
    val got = Quantiles
      .exactPercentiles(li, "l_returnflag", "price_c", ps)
      .orderBy(col("l_returnflag")).collect()
    val want = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(price_c, 0.0)").as("p0"),
        expr("percentile(price_c, 0.25)").as("p25"),
        expr("percentile(price_c, 0.5)").as("med"),
        expr("percentile(price_c, 0.9)").as("p90"),
        expr("percentile(price_c, 0.95)").as("p95"),
        expr("percentile(price_c, 1.0)").as("p100"))
      .orderBy(col("l_returnflag")).collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) == w.getString(0))
      ps.foreach { case (name, _) =>
        assert(g.getAs[Double](name) == w.getAs[Double](name),
          s"flag=${g.getString(0)} $name")
      }
    }
  }

  test("single-row group: every percentile is that row's value") {
    import spark.implicits._
    val df = Seq(("a", 10.0), ("a", 20.0), ("a", 30.0), ("b", 7.0))
      .toDF("k", "v")
    val r = Quantiles.exactPercentiles(df, "k", "v", ps)
      .orderBy(col("k")).collect()
    val b = r(1)
    assert(b.getString(0) == "b")
    ps.foreach { case (name, _) => assert(b.getAs[Double](name) == 7.0) }
    val a = r(0)
    assert(a.getAs[Double]("med") == 20.0)
    assert(a.getAs[Double]("p25") == 15.0) // interpolated between 10 and 20
    assert(a.getAs[Double]("p0") == 10.0 && a.getAs[Double]("p100") == 30.0)
  }

  test("null values are ignored exactly like the builtin percentile") {
    import spark.implicits._
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(2.0)),
      ("b", None)).toDF("k", "v")
    val r = Quantiles.exactPercentiles(df, "k", "v", Seq("med" -> 0.5))
      .collect()
    // key "a": median over {1.0, 2.0} = 1.5 (null shifts nothing);
    // key "b" (all null) is absent — documented divergence from the
    // builtin's null-valued row
    assert(r.length == 1 && r(0).getString(0) == "a")
    assert(r(0).getAs[Double]("med") == 1.5)
  }

  test("duplicate-heavy values: rank ranges straddle repeats correctly") {
    import spark.implicits._
    // 0-indexed sorted: [1,1,1,1,2] — pos(0.5)=2 → 1.0; pos(0.75)=3 → 1.0;
    // pos(0.9)=3.6 → 1 + 0.6*(2-1) = 1.6
    val df = Seq.fill(4)(("k", 1.0)).toDF("k", "v")
      .union(Seq(("k", 2.0)).toDF("k", "v"))
    val r = Quantiles.exactPercentiles(df, "k", "v",
      Seq("med" -> 0.5, "p75" -> 0.75, "p90" -> 0.9)).collect()(0)
    assert(r.getAs[Double]("med") == 1.0)
    assert(r.getAs[Double]("p75") == 1.0)
    assert(math.abs(r.getAs[Double]("p90") - 1.6) < 1e-12)
  }
}
