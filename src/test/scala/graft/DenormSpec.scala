package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Denorm

/** Golden-document shape tests (SURVEY.md §5.2): nested schema, empty
  * arrays (not null), round-trip explode ≡ original join. */
class DenormSpec extends SparkSpec {

  lazy val docs = Denorm.docs(spark, sf).cache()

  test("nested schema shape matches the document model") {
    val s = docs.schema
    assert(s.fieldNames.toSeq ==
      Seq("id", "status", "priority", "total_price", "created_at",
        "author", "items", "annotations"))
    assert(s("author").dataType.isInstanceOf[StructType])
    val items = s("items").dataType.asInstanceOf[ArrayType]
    assert(items.elementType.asInstanceOf[StructType].fieldNames.toSeq ==
      Seq("linenumber", "partkey", "suppkey", "quantity", "extendedprice",
        "returnflag"))
    val anns = s("annotations").dataType.asInstanceOf[ArrayType]
    val ann = anns.elementType.asInstanceOf[StructType]
    assert(ann.fieldNames.toSeq == Seq("entity", "domain"))
  }

  test("one document per order; absent children are empty arrays, not null") {
    val nOrders = Tables.orders(spark, sf).count()
    assert(docs.count() == nOrders)
    assert(docs.filter(col("items").isNull || col("annotations").isNull)
      .count() == 0)
  }

  test("docsFiltered: semi-join prune equals the naive build-then-filter") {
    val keep = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === "R").select(col("l_orderkey"))
    val pushed = Denorm.docsFiltered(spark, sf, keep, withAnnotations = false)
      .filter(exists(col("items"), i => i.getField("returnflag") === "R"))
      .select("id").collect().map(_.getLong(0)).toSet
    val naive = docs
      .filter(exists(col("items"), i => i.getField("returnflag") === "R"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(pushed == naive)
    assert(pushed.nonEmpty)
  }

  test("docsFiltered skips unreferenced child collections in the schema") {
    val keep = Tables.orders(spark, sf).select(col("o_orderkey"))
    val fields = Denorm.docsFiltered(spark, sf, keep, withItems = false)
      .schema.fieldNames.toSeq
    assert(fields.contains("annotations") && !fields.contains("items"))
  }

  test("items are sorted by linenumber within each doc") {
    val bad = docs.filter(exists(
      zip_with(col("items"), slice(col("items"), lit(2), size(col("items"))),
        (a, b) => b.getField("linenumber") < a.getField("linenumber")),
      x => x)).count()
    assert(bad == 0)
  }

  test("round-trip: explode(docs) == orders ⋈ lineitem") {
    val rt = Denorm.roundtrip(spark, sf)
    val li = Tables.lineitem(spark, sf)
    assert(rt.count() == li.count())
    val joined = li.join(Tables.orders(spark, sf),
      col("l_orderkey") === col("o_orderkey"))
    assert(rt.count() == joined.count())
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("childrenTable artifact equals the live aggregation") {
    // the maintained ingest table must be a bit-faithful materialization
    // of the live childrenPerOrder plan — same rows, same nested arrays
    val live = Denorm.childrenPerOrder(spark, sf)
    val artifact = Denorm.childrenTable(spark, sf)
    assert(artifact.count() == live.count())
    // parquet relaxes nullability on roundtrip; the TYPES must match
    def ddl(df: org.apache.spark.sql.DataFrame) =
      df.schema.toDDL.replace(" NOT NULL", "")
    assert(ddl(artifact) == ddl(live))
    val ids = Seq(2L, 434L, 1075L)
    val a = artifact.filter(col("order_id").isin(ids: _*))
      .orderBy("order_id").collect()
    val l = live.filter(col("order_id").isin(ids: _*))
      .orderBy("order_id").collect()
    assert(a.sameElements(l))
    // the artifact is on disk with its completion marker, and a second
    // consumer reads the SAME files (no rebuild)
    val dir = artifact.inputFiles.head.replaceAll("/[^/]+$", "")
    assert(new java.io.File(dir.replace("file:", ""), "_DONE").exists())
    assert(Denorm.childrenTable(spark, sf).inputFiles.sorted
      .sameElements(artifact.inputFiles.sorted))
  }
}
