package graft

import org.scalatest.funsuite.AnyFunSuite

/** The query registry after the round-14 per-family split: SparkEntry
  * composes 11 family modules with `++`, which would SILENTLY
  * overwrite on a duplicate key — so disjointness is asserted here,
  * along with the oracle ⊆ queries contract the driver harness
  * assumes and the name↔family placement rule the split encodes. */
class RegistrySpec extends AnyFunSuite {

  test("family query maps are pairwise key-disjoint (++ cannot overwrite)") {
    val fams = SparkEntry.families
    val total = fams.map(_._2.size).sum
    assert(SparkEntry.queries.size == total,
      s"union has ${SparkEntry.queries.size} keys but families sum to " +
        s"$total — a duplicate key is being silently overwritten")
    val oTotal = fams.map(_._3.size).sum
    assert(SparkEntry.oracleSql.size == oTotal)
  }

  test("every oracle names a declared query, and every query has an oracle") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
  }

  test("registry size matches the declared surface") {
    assert(SparkEntry.queries.size == 275,
      s"expected 275 declared queries, got ${SparkEntry.queries.size} — " +
        "update this pin (and README) when adding operators")
  }
}
