package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Candidate pre-selection kernel for the percolator (the same
  * refinement ES applies with its internal term index over stored
  * queries): a doc can only match a query with a `must` clause if the
  * doc contains every must term, so ONE must term per query is a
  * necessary condition; a must-free query with `minimum_should_match ≥
  * 1` requires at least one of its should terms; a query with neither
  * has no necessary term and stays a residual always-candidate.
  *
  * The index rides as a constant spec string
  * (`"res1,res2|term:q1,q2;term2:q3"`) through the expression's
  * references array and is parsed ONCE per JVM into a hash map, cached
  * by spec identity (the [[BpeImpl]] discipline) — per row the kernel
  * is |tokens| hash lookups, no parsing, no per-row allocation beyond
  * the result.
  */
object PercolateIndexImpl {
  private final class Index(val residual: Array[Long],
                            val postings: java.util.HashMap[String, Array[Long]])

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Index]()

  private def parse(spec: String): Index =
    cache.computeIfAbsent(spec, s => {
      val bar = s.indexOf('|')
      val resPart = s.substring(0, bar)
      val residual =
        if (resPart.isEmpty) Array.empty[Long]
        else resPart.split(',').map(_.toLong)
      val postings = new java.util.HashMap[String, Array[Long]]()
      val postPart = s.substring(bar + 1)
      if (postPart.nonEmpty) postPart.split(';').foreach { p =>
        val colon = p.indexOf(':')
        postings.put(p.substring(0, colon),
          p.substring(colon + 1).split(',').map(_.toLong))
      }
      new Index(residual, postings)
    })

  /** Distinct candidate query ids for one doc's token set, ascending
    * (deterministic output order). */
  def candidates(toks: ArrayData, spec: String): ArrayData = {
    val idx = parse(spec)
    val hit = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < idx.residual.length) { hit.add(idx.residual(i)); i += 1 }
    var t = 0
    val n = toks.numElements()
    while (t < n) {
      if (!toks.isNullAt(t)) {
        val qids = idx.postings.get(toks.getUTF8String(t).toString)
        if (qids != null) {
          var j = 0
          while (j < qids.length) { hit.add(qids(j)); j += 1 }
        }
      }
      t += 1
    }
    val out = new Array[Long](hit.size)
    val it = hit.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}
