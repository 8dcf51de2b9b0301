package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Candidate pre-selection kernel for the percolator (the same
  * refinement ES applies with its internal term index over stored
  * queries): a doc can only match a query with a `must` clause if the
  * doc contains every must term, so the rarest must term per query is
  * a necessary condition — and for queries with ≥2 must terms the TWO
  * rarest are BOTH necessary (ES's conjunction pre-selection): the
  * posting probe keys on the rarest term and the candidate survives
  * only if the second-rarest is also present, shrinking the candidate
  * set multiplicatively for queries built from mid-frequency terms
  * (where any single posting list stays large). A must-free query with
  * `minimum_should_match ≥ 1` requires at least one of its should
  * terms; a query with neither has no necessary term and stays a
  * residual always-candidate.
  *
  * The index rides as a constant spec string
  * (`"res1,res2|term:q1,q2;term2:q3|q1=secondterm;q3=other"`) through
  * the expression's references array and is parsed ONCE per JVM into
  * hash maps, cached by spec identity (the [[BpeImpl]] discipline) —
  * per row the kernel is |tokens| set inserts + |tokens| hash lookups
  * + |candidates| conjunction probes, no parsing, no per-row
  * allocation beyond a token set and the result.
  */
object PercolateIndexImpl {
  private final class Index(val residual: Array[Long],
                            val postings: java.util.HashMap[String, Array[Long]],
                            val second: java.util.HashMap[java.lang.Long, String])

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Index]()

  private def parse(spec: String): Index =
    cache.computeIfAbsent(spec, s => {
      val parts = s.split('|')
      val resPart = if (parts.length > 0) parts(0) else ""
      val residual =
        if (resPart.isEmpty) Array.empty[Long]
        else resPart.split(',').map(_.toLong)
      val postings = new java.util.HashMap[String, Array[Long]]()
      val postPart = if (parts.length > 1) parts(1) else ""
      if (postPart.nonEmpty) postPart.split(';').foreach { p =>
        val colon = p.indexOf(':')
        postings.put(p.substring(0, colon),
          p.substring(colon + 1).split(',').map(_.toLong))
      }
      val second = new java.util.HashMap[java.lang.Long, String]()
      val conjPart = if (parts.length > 2) parts(2) else ""
      if (conjPart.nonEmpty) conjPart.split(';').foreach { c =>
        val eq = c.indexOf('=')
        second.put(java.lang.Long.valueOf(c.substring(0, eq)),
          c.substring(eq + 1))
      }
      new Index(residual, postings, second)
    })

  /** Distinct candidate query ids for one doc's token set, ascending
    * (deterministic output order). */
  def candidates(toks: ArrayData, spec: String): ArrayData = {
    val idx = parse(spec)
    val hit = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < idx.residual.length) { hit.add(idx.residual(i)); i += 1 }
    val n = toks.numElements()
    if (idx.second.isEmpty) {
      // no conjunction entries: single probe pass, no token set needed
      var t = 0
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
    } else {
      // conjunction probes need the full token SET first — the second
      // required term may sit anywhere in the array relative to the
      // posting key that surfaced the candidate
      val tokSet = new java.util.HashSet[String](n * 2)
      var t = 0
      while (t < n) {
        if (!toks.isNullAt(t)) tokSet.add(toks.getUTF8String(t).toString)
        t += 1
      }
      val it = tokSet.iterator()
      while (it.hasNext) {
        val qids = idx.postings.get(it.next())
        if (qids != null) {
          var j = 0
          while (j < qids.length) {
            val qid = java.lang.Long.valueOf(qids(j))
            val need = idx.second.get(qid)
            if (need == null || tokSet.contains(need)) hit.add(qid)
            j += 1
          }
        }
      }
    }
    val out = new Array[Long](hit.size)
    val iter = hit.iterator()
    var k = 0
    while (iter.hasNext) { out(k) = iter.next(); k += 1 }
    new GenericArrayData(out)
  }
}
