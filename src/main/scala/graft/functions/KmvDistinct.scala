package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** KMV (k-minimum-values) approximate-distinct sketch as a native
  * Catalyst aggregate function — the Spark spelling of ClickHouse's
  * imperative aggregate-function machinery (`uniq`-family internals,
  * `-State`/`-Merge` combinators): a `TypedImperativeAggregate` whose
  * buffer is the set of the k smallest DISTINCT 60-bit hashes seen,
  * with real `update`/`merge`/`serialize` states.
  *
  * Same estimator as the composed e13c pipeline (distinct → two-level
  * k-min → window), so it is oracled against the identical DuckDB SQL:
  * with fewer than k distinct hashes the sketch is exact (estimate =
  * |buffer|), otherwise estimate = (k-1)·2⁶⁰ / kth-min. The double
  * arithmetic mirrors e13c token for token ((k-1)·2⁶⁰ is exact in
  * double, one IEEE division) so results are bit-identical across
  * engines.
  *
  * Scale shape: this is the "one aggregation" version of the sketch —
  * partial buffers of ≤ k longs combine map-side (ObjectHashAggregate,
  * no sort), the shuffle moves ≤ k·8 bytes per (group, map task), and
  * merge is a bounded set-union. The composed e13c spelling shuffles
  * every distinct key once; this never moves more than the sketch.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"sketch size must be >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmvdistinct64 input must be a 60-bit hash LONG (md5prefix64), got ${child.dataType}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "kmvdistinct64"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    // Only touch the tree when h would enter the sketch: below the
    // current kth-min, or the sketch is not full yet.
    if (buf.size() < k || h < buf.last()) {
      buf.add(h)
      if (buf.size() > k) buf.pollLast()
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size() < k) buf.size().toDouble
    else ((k - 1).toDouble * math.pow(2.0, 60)) / buf.last().toDouble

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
}

object KmvDistinct {
  /** `kmvDistinct64(h, k)` as an aggregate Column over 60-bit hashes
    * (pair with [[HashFunctions.md5prefix64]] on the key).
    */
  def kmvDistinct64(c: Column, k: Int): Column =
    ColumnBridge.column(
      KmvDistinct(ColumnBridge.expression(c), k).toAggregateExpression())
}
