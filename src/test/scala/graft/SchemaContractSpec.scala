package graft

import org.apache.spark.sql.types._

/** Schema contract for the driver-generated test tables against the LIVE
  * /root/testdata — the single place a driver-side parquet regeneration
  * should fail, instead of eight scattered query errors (round-5 verdict
  * item 2: the TIMESTAMP(NANOS) → TIMESTAMP_NTZ events regeneration broke
  * 8 queries + 3 tests before any contract caught it).
  *
  * The assertions pin the types each operator family actually relies on:
  * `events.ts` MUST land as TimestampType after `Tables.events` ingest
  * normalization (watermarks + unix_micros both require it), embeddings
  * must stay Array[Float]-compatible, documents must keep its text/media
  * columns. Key columns are pinned exactly; for wide fact tables we pin
  * the columns queries touch rather than the full schema, so a benign
  * driver-side column addition doesn't fail the suite.
  */
class SchemaContractSpec extends SparkSpec {

  private def typeOf(table: String, col: String): DataType =
    Tables(spark, sf, table).schema(col).dataType

  private val integral: Set[DataType] =
    Set(ByteType, ShortType, IntegerType, LongType)

  test("events.ts normalizes to TimestampType under every encoding") {
    // THE round-5 regression: any future encoding change must fail HERE.
    assert(typeOf("events", "ts") == TimestampType,
      "events.ts must be TimestampType after Tables.events normalization " +
      "(watermarks and unix_micros depend on it)")
  }

  test("events keeps its key/event columns") {
    val s = Tables.events(spark, sf).schema
    for (c <- Seq("user_id", "event_type", "ts"))
      assert(s.fieldNames.contains(c), s"events missing column $c")
  }

  test("streaming ingest shares the batch ts contract") {
    val s = streaming.EventStream.eventsStream(spark, sf).schema
    assert(s("ts").dataType == TimestampType,
      "eventsStream.ts must match the batch TimestampType contract")
  }

  test("embeddings.embedding is an array of floating-point") {
    typeOf("embeddings", "embedding") match {
      case ArrayType(FloatType | DoubleType, _) => // ok
      case other => fail(s"embeddings.embedding is $other, expected " +
        "array<float|double> (ANN kernels assume numeric arrays)")
    }
  }

  test("documents keeps text + media columns with expected types") {
    val s = Tables.documents(spark, sf).schema
    assert(integral(s("doc_id").dataType) ||
           s("doc_id").dataType == StringType)
    assert(s("text").dataType == StringType)
    for (c <- Seq("media", "audio") if s.fieldNames.contains(c))
      assert(s(c).dataType == BinaryType, s"documents.$c must be binary")
  }

  test("fact/dim key columns keep integral types") {
    // The join family hashes on these; a driver-side retype to string
    // would silently change shuffle hashing + oracle hash compare.
    val keys = Seq(
      ("orders", "o_orderkey"), ("orders", "o_custkey"),
      ("lineitem", "l_orderkey"), ("lineitem", "l_partkey"),
      ("customer", "c_custkey"), ("customer", "c_nationkey"),
      ("supplier", "s_suppkey"), ("part", "p_partkey"),
      ("nation", "n_nationkey"), ("nation", "n_regionkey"),
      ("region", "r_regionkey"))
    for ((t, c) <- keys)
      assert(integral(typeOf(t, c)),
        s"$t.$c must stay integral, got ${typeOf(t, c)}")
  }
}
