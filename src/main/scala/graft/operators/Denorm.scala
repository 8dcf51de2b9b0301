package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The denormalizing ETL — the reference's single big query
  * (kuko6/tweets-elastic `src/main.py:43-101`) transposed to the
  * testdata star schema (FIXTURES.md §B): one nested document per
  * `orders` row, carrying its `customer` as an embedded struct (J1) and
  * two child collections as arrays of structs built by pre-aggregated
  * left-joined subqueries (J2/A1: `GROUP BY` + `json_agg` →
  * `groupBy().agg(collect_list(struct(...)))`), with
  * `COALESCE(..., '[]')` empty-array defaults (P9, `src/main.py:47-51`).
  *
  * Scale notes (100 TB design):
  *  - the child aggregations shuffle on the join key itself, so the
  *    left joins that follow reuse the hash partitioning — one shuffle
  *    per child table, no re-shuffle at the join (Catalyst reuses the
  *    child's `HashPartitioning(l_orderkey)` for the sort-merge join);
  *  - dimension lookups (part, supplier, nation) are broadcast inner
  *    joins before aggregation, so the fact table is only shuffled once;
  *  - arrays are sorted inside each group (`sort_array`) to make output
  *    deterministic — the same trick the oracle SQL uses (`ORDER BY`
  *    inside `list()`), see SURVEY.md §7 risk (4). This also preserves
  *    the reference's insertion-order semantics (Postgres `json_agg`
  *    emits child-table order, `src/main.py:55`): the leading sort key
  *    is the child's insertion key (`l_linenumber` — the within-parent
  *    sequence number), so the arrays come out in the same order the
  *    reference produces, with the remaining struct fields only as a
  *    determinism tiebreak. `collect_list` alone cannot promise any
  *    order on a cluster (partial aggs merge in task-completion order);
  *    sorting on the insertion key inside the group is the
  *    distributed-correct way to say "insertion order".
  */
object Denorm {

  /** Array-of-structs child collection: lineitems per order, the analog
    * of the reference's links/annotations child arrays. */
  def itemsPerOrder(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey").as("order_id"))
      .agg(sort_array(collect_list(struct(
        col("l_linenumber").as("linenumber"),
        col("l_partkey").as("partkey"),
        col("l_suppkey").as("suppkey"),
        col("l_quantity").as("quantity"),
        col("l_extendedprice").as("extendedprice"),
        col("l_returnflag").as("returnflag")))).as("items"))

  /** Entity/domain annotations per order — the analog of the reference's
    * `context_annotations` (entity ⋈ domain resolved through dims,
    * `src/main.py:54-60`): part plays context_entities, the supplier's
    * nation plays context_domains. Dims are broadcast (they are small
    * relative to the fact table at every scale). */
  def annotationsPerOrder(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val part = Tables.part(spark, dir)
    val supp = Tables.supplier(spark, dir)
    val nation = Tables.nation(spark, dir)
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
      .join(broadcast(nation), supp("s_nationkey") === nation("n_nationkey"))
      .groupBy(col("l_orderkey").as("order_id"))
      .agg(sort_array(collect_list(struct(
        struct(
          col("p_partkey").as("id"),
          col("p_name").as("name"),
          col("p_type").as("description")).as("entity"),
        struct(
          col("n_nationkey").cast("long").as("id"),
          col("n_name").as("name")).as("domain")))).as("annotations"))
  }

  /** One nested document per order — the engine's analog of the tweet
    * document (`docs/sample_document.json`, FIXTURES.md §A). */
  def docs(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val items = itemsPerOrder(spark, dir)
    val anns = annotationsPerOrder(spark, dir)

    val itemsType = items.schema("items").dataType
    val annsType = anns.schema("annotations").dataType

    orders
      .join(cust, orders("o_custkey") === cust("c_custkey"), "inner") // J1
      .join(items, orders("o_orderkey") === items("order_id"), "left") // J2
      .join(anns, orders("o_orderkey") === anns("order_id"), "left")
      .select(
        orders("o_orderkey").as("id"),
        orders("o_orderstatus").as("status"),
        orders("o_orderpriority").as("priority"),
        orders("o_totalprice").as("total_price"),
        orders("o_orderdate").as("created_at"),
        struct(
          cust("c_custkey").as("id"),
          cust("c_name").as("name"),
          cust("c_mktsegment").as("segment"),
          cust("c_acctbal").as("acctbal")).as("author"),
        coalesce(col("items"), array().cast(itemsType)).as("items"),
        coalesce(col("annotations"),
          array().cast(annsType)).as("annotations"))
  }

  /** Round-trip check query: explode the nested docs back to flat
    * (order, item) rows — must equal the plain orders ⋈ customer ⋈
    * lineitem join. Flat output ⇒ hash-friendly DuckDB oracle. */
  def roundtrip(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("id"), col("author.id").as("author_id"),
        explode(col("items")).as("item"))
      .select(col("id"), col("author_id"),
        col("item.linenumber").as("linenumber"),
        col("item.partkey").as("partkey"),
        col("item.quantity").as("quantity"),
        col("item.returnflag").as("returnflag"))
}
