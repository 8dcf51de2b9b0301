package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding merge application — the real tokenizer-apply
  * algorithm (Sennrich et al. 2016 / the GPT-2 encoder's merge loop),
  * not a regex approximation. Training the merge table is a corpus
  * aggregation done once offline; APPLYING it is the per-document hot
  * path a data pipeline runs at scale, so that is what's implemented
  * here: per pre-token, start from single characters and repeatedly
  * merge the adjacent pair with the lowest merge rank until none
  * applies.
  *
  * MUST be a top-level object (static forwarders for Janino — see
  * [[Impl]]). The merge table travels as a compact comma-separated
  * "left right" spec string (a codegen-referenceable constant) and is
  * parsed once per JVM into a rank map, cached by spec identity.
  */
object BpeImpl {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.HashMap[String, Integer]]()

  private def ranks(spec: String): java.util.HashMap[String, Integer] =
    cache.computeIfAbsent(spec, s => {
      val m = new java.util.HashMap[String, Integer]()
      var i = 0
      s.split(",").foreach { pair =>
        if (pair.nonEmpty) { m.put(pair, Integer.valueOf(i)); i += 1 }
        ()
      }
      m
    })

  /** Apply the merge table to one pre-token. Symbols start as code
    * points (surrogate-pair safe); each round merges every
    * non-overlapping occurrence of the current lowest-rank adjacent
    * pair, left to right — the published BPE apply order. */
  private def encodeWord(word: String,
                         rk: java.util.HashMap[String, Integer],
                         out: scala.collection.mutable.ArrayBuffer[UTF8String]): Unit = {
    var syms = new scala.collection.mutable.ArrayBuffer[String]()
    var ci = 0
    while (ci < word.length) {
      val cp = word.codePointAt(ci)
      val n = Character.charCount(cp)
      syms += word.substring(ci, ci + n)
      ci += n
    }
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var j = 0
      while (j < syms.length - 1) {
        val r = rk.get(syms(j) + " " + syms(j + 1))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); bestIdx = j
        }
        j += 1
      }
      if (bestIdx < 0) continue = false
      else {
        val l = syms(bestIdx); val r = syms(bestIdx + 1)
        val merged = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var k = 0
        while (k < syms.length) {
          if (k < syms.length - 1 && syms(k) == l && syms(k + 1) == r) {
            merged += l + r; k += 2
          } else { merged += syms(k); k += 1 }
        }
        syms = merged
        continue = syms.length > 1
      }
    }
    syms.foreach(s => out += UTF8String.fromString(s))
  }

  /** Array-of-pre-tokens → array of BPE tokens (concatenated across
    * pre-tokens, each encoded independently — merges never cross a
    * pre-token boundary, exactly like production BPE tokenizers). */
  def encode(arr: ArrayData, spec: String): ArrayData = {
    if (arr == null) return null
    val rk = ranks(spec)
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    var i = 0
    while (i < arr.numElements()) {
      val w = arr.getUTF8String(i)
      if (w != null && w.numChars() > 0) encodeWord(w.toString, rk, out)
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }
}
