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

object aggregates {
  /** Sorted, size-capped (id, setsize) posting list; buckets past the
    * cap surface as arrays of length cap + 1 for the caller to drop. */
  def capped_collect_postings(id: Column, setsize: Column,
                              cap: Int): Column =
    GraftShim.toColumn(CappedCollectPostings(
      GraftShim.toExpression(id), GraftShim.toExpression(setsize),
      cap).toAggregateExpression())
}
