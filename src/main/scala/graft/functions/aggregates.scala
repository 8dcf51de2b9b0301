package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Size-capped posting-list collection for the inverted-index dedup
  * join ([[graft.operators.Dedup.jaccardPairs]]).
  *
  * `sort_array(collect_list(struct(id, setsize)))` + a size filter is
  * semantically right but materializes the FULL posting list of a
  * corpus-wide stop-shingle in one aggregation buffer before the
  * filter discards it — at 100 TB that is an unbounded single-key
  * buffer. This aggregate stops accumulating at `cap + 1` entries
  * (update- AND merge-side), so memory per key is bounded while the
  * downstream `size ≤ cap` filter still sees an over-cap marker value
  * and drops the bucket — output is identical to the uncapped
  * formulation (asserted in DedupSpec on a crafted stop-shingle
  * corpus). Output array is sorted by (id, setsize), matching
  * `sort_array` on the struct. */
case class CappedCollectPostings(
    idChild: Expression, sizeChild: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, Int)]]
  with BinaryLike[Expression] {

  override def left: Expression = idChild
  override def right: Expression = sizeChild

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("setsize", IntegerType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): ArrayBuffer[(Long, Int)] =
    ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Long, Int)],
                      input: InternalRow): ArrayBuffer[(Long, Int)] = {
    if (buf.length <= cap) {
      val id = idChild.eval(input)
      val sz = sizeChild.eval(input)
      if (id != null && sz != null)
        buf += ((id.asInstanceOf[Long], sz.asInstanceOf[Int]))
    }
    buf
  }

  override def merge(a: ArrayBuffer[(Long, Int)],
                     b: ArrayBuffer[(Long, Int)]): ArrayBuffer[(Long, Int)] = {
    val room = cap + 1 - a.length
    if (room > 0) a ++= b.take(room)
    a
  }

  override def eval(buf: ArrayBuffer[(Long, Int)]): Any = {
    val sorted = buf.sorted
    new GenericArrayData(
      sorted.map { case (i, s) => InternalRow(i, s) }.toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[(Long, Int)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 12 * buf.length)
    bb.putInt(buf.length)
    buf.foreach { case (i, s) => bb.putLong(i); bb.putInt(s) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Int)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(Long, Int)](n)
    var i = 0
    while (i < n) { buf += ((bb.getLong, bb.getInt)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CappedCollectPostings =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CappedCollectPostings =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CappedCollectPostings =
    copy(idChild = l, sizeChild = r)
  override def prettyName: String = "capped_collect_postings"
}

/** Bounded top-k by (score desc, id asc) — the per-group analog of
  * TakeOrderedAndProject's heap, as an aggregate.
  *
  * `collect_list` + `slice` per group is semantically right but
  * accumulates EVERY candidate row of the group in one aggregation
  * buffer before the slice discards all but k — unbounded transient
  * state at scale. This buffer never holds more than k (score, id)
  * pairs on either the update or the merge side, stays sorted (k is
  * small — ranked-retrieval sized), partial-aggregates map-side, and
  * ships 16·k bytes per group through the shuffle. Used by the batched
  * KNN paths ([[graft.operators.Similarity]] topKPerQuery). */
case class TopKByScore(
    scoreChild: Expression, idChild: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]]
  with BinaryLike[Expression] {

  override def left: Expression = scoreChild
  override def right: Expression = idChild

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cos_sim", DoubleType, nullable = false),
    StructField("vec_id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  /** (s1,i1) ranks strictly ahead of (s2,i2). `Double.compare` gives a
    * TOTAL order including NaN (which ranks above every number —
    * matching Spark's descending sort, so batch results stay identical
    * to the single-query orderBy paths even on degenerate scores; a
    * plain `>` is false in both directions for NaN and would let one
    * pin an arbitrary buffer slot, making results arrival-order-
    * dependent). */
  @inline private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && i1 < i2)
  }

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  private def insert(buf: ArrayBuffer[(Double, Long)], s: Double,
                     id: Long): Unit = {
    if (buf.length == k && !beats(s, id, buf.last._1, buf.last._2)) return
    var i = buf.length
    while (i > 0 && beats(s, id, buf(i - 1)._1, buf(i - 1)._2)) i -= 1
    buf.insert(i, (s, id))
    if (buf.length > k) buf.remove(k)
  }

  override def update(buf: ArrayBuffer[(Double, Long)],
                      input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = scoreChild.eval(input)
    val id = idChild.eval(input)
    if (s != null && id != null)
      // + 0.0 collapses -0.0 to 0.0 so the sign of a rounded-away
      // epsilon can't order two zero scores (Spark's comparator treats
      // them equal; Double.compare does not)
      insert(buf, s.asInstanceOf[Double] + 0.0, id.asInstanceOf[Long])
    buf
  }

  override def merge(a: ArrayBuffer[(Double, Long)],
                     b: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    b.foreach { case (s, id) => insert(a, s, id) }
    a
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(
      buf.map { case (s, id) => InternalRow(s, id) }.toArray[Any])

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.length)
    bb.putInt(buf.length)
    buf.foreach { case (s, id) => bb.putDouble(s); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(Double, Long)](n)
    var i = 0
    while (i < n) { buf += ((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): TopKByScore =
    copy(scoreChild = l, idChild = r)
  override def prettyName: String = "top_k_by_score"
}

/** Elementwise sum of `array<long>` vectors — the model-sized
  * reduction behind the distributed Lloyd's update
  * ([[graft.operators.Similarity.kmeansDistributed]]).
  *
  * The round-13 trainer reduced per-(cell, element) via `posexplode +
  * groupBy(cell, j)` — correct, but the per-iteration collect was
  * k·dim four-field Rows whose object overhead is ~4–5× the raw
  * matrix (multi-GB transient at 10⁵ cells × 768 dims). This
  * aggregate keeps the identical order-independent fixed-point long
  * sums while shipping ONE array-valued row per cell: buffer is a
  * bare `Array[Long]` of the vector's length (Θ(dim), bounded),
  * update/merge are elementwise long adds (associative + commutative
  * ⇒ deterministic under any partitioning), partial-aggregates
  * map-side. Mismatched input lengths fail loudly — silent truncation
  * would corrupt centroids. */
case class LongVecSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  // loud ANALYSIS-time refusal on non-long arrays: toLongArray over an
  // array<double> would reinterpret IEEE-754 bit patterns as longs —
  // garbage sums with no error (and deliberately NOT an implicit
  // cast, whose silent double→long truncation would corrupt instead
  // of refuse)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"long_vec_sum expects array<bigint>, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  // length-0 = "no rows seen yet" sentinel; a genuine zero-length input
  // vector is refused below, so the states cannot collide
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  @inline private def addInto(buf: Array[Long], v: Array[Long]): Array[Long] =
    if (buf.length == 0) v
    else {
      require(buf.length == v.length,
        s"long_vec_sum: mixed vector lengths ${buf.length} vs ${v.length}")
      var j = 0
      while (j < v.length) { buf(j) += v(j); j += 1 }
      buf
    }

  // statically nullable elements get a per-element guard in update:
  // toLongArray over an array WITH nulls silently reads 0 from
  // UnsafeArrayData (null bits aren't values), corrupting sums with
  // no error — the exact failure mode the analysis-time refusal above
  // exists to prevent. Internal callers build containsNull=false
  // arrays, so the hot path pays nothing.
  private lazy val elemNullable: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val a = child.eval(input)
    if (a == null) buf
    else {
      val ad = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (elemNullable) {
        var j = 0
        val n = ad.numElements()
        while (j < n) {
          require(!ad.isNullAt(j),
            s"long_vec_sum: null element at index $j — null-bearing " +
              "vectors would corrupt the sum silently")
          j += 1
        }
      }
      val v = ad.toLongArray()
      require(v.length > 0, "long_vec_sum: empty input vector")
      // first row: clone — toLongArray may alias reused column memory
      addInto(buf, if (buf.length == 0) v.clone() else v)
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.length == 0) b else if (b.length == 0) a else addInto(a, b)

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): LongVecSum =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): LongVecSum =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): LongVecSum =
    copy(child = c)
  override def prettyName: String = "long_vec_sum"
}

object aggregates {
  /** Sorted, size-capped (id, setsize) posting list; buckets past the
    * cap surface as arrays of length cap + 1 for the caller to drop. */
  def capped_collect_postings(id: Column, setsize: Column,
                              cap: Int): Column =
    GraftShim.toColumn(CappedCollectPostings(
      GraftShim.toExpression(id.cast("long")),
      GraftShim.toExpression(setsize.cast("int")),
      cap).toAggregateExpression())

  /** Elementwise sum of array<long> vectors; one Θ(dim) buffer per
    * group, order-independent long adds. */
  def long_vec_sum(v: Column): Column =
    GraftShim.toColumn(LongVecSum(
      GraftShim.toExpression(v)).toAggregateExpression())

  /** Rank-ordered top-k (score desc, id asc) as array<struct<cos_sim,
    * vec_id>>; buffer bounded at k entries on both agg sides. */
  def top_k_by_score(score: Column, id: Column, k: Int): Column = {
    require(k > 0, s"top_k_by_score needs k > 0, got $k")
    GraftShim.toColumn(TopKByScore(
      GraftShim.toExpression(score.cast("double")),
      GraftShim.toExpression(id.cast("long")),
      k).toAggregateExpression())
  }
}
