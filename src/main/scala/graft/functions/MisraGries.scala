package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Misra-Gries heavy-hitters summary (K21) as a native Catalyst
  * aggregate — the mergeable frequent-items sketch (Misra & Gries
  * 1982; merge rule from Agarwal et al. 2012, "Mergeable Summaries").
  * The buffer holds ≤ k (key, counter) pairs:
  *
  *  - update: resident key → increment; free slot → insert at 1;
  *    full → decrement ALL counters, dropping zeros (the arriving
  *    key is not inserted — classic MG).
  *  - merge: add counters pointwise; if over k entries, subtract the
  *    (k+1)-th largest counter from every entry and drop ≤ 0 — the
  *    Agarwal et al. rule that keeps summaries mergeable with the
  *    same bound.
  *
  * GUARANTEE (the one the e25b screen-verify query builds on): for a
  * stream of n items, any key with true count > n/(k+1) is present
  * in the final summary, whatever the partitioning or merge order —
  * undercount is bounded by total decrements ≤ n/(k+1). The SET of
  * surviving low-frequency keys IS order-dependent (sketches are),
  * which is why the production query treats the summary as a
  * candidate SCREEN and re-counts candidates exactly: the guarantee
  * makes the screen false-negative-free above the threshold, so
  * screen + exact verify ≡ the exact heavy-hitter query, bit-exact
  * and oracle-able, while the exact aggregation only ever touches
  * ≤ k candidate keys.
  *
  * Scale shape: partial buffers of ≤ k pairs combine map-side
  * (ObjectHashAggregate); the shuffle moves ≤ 16k bytes per map
  * task regardless of key cardinality — the e25 exact top-K
  * shuffles one row per DISTINCT key, which at 10⁹⁺ keys (token
  * vocabularies, URL sets) is exactly the shuffle this sketch
  * removes.
  *
  * eval returns the surviving keys as a SORTED array<long> (the
  * counters are not exposed: estimates are order-dependent, keys are
  * what the verify pass needs).
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[java.lang.Long, java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"summary size must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"misra_gries input must be a 60-bit hash LONG (md5prefix64), got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  private type Buf = java.util.HashMap[java.lang.Long, java.lang.Long]

  override def createAggregationBuffer(): Buf = new Buf()

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val key = java.lang.Long.valueOf(v.asInstanceOf[Long])
      val cur = buf.get(key)
      if (cur != null) buf.put(key, cur + 1L)
      else if (buf.size() < k) buf.put(key, 1L)
      else {
        // decrement-all, drop zeros; the arriving key is NOT inserted
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      buf.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    if (buf.size() > k) {
      // subtract the (k+1)-th largest counter from every entry
      val vals = new Array[Long](buf.size())
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val sub = vals(vals.length - (k + 1)) // (k+1)-th largest
      val eit = buf.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= sub) eit.remove() else e.setValue(e.getValue - sub)
      }
    }
    buf
  }

  override def eval(buf: Buf): Any = {
    val keys = new Array[Long](buf.size())
    var i = 0
    val it = buf.keySet().iterator()
    while (it.hasNext) { keys(i) = it.next(); i += 1 }
    java.util.Arrays.sort(keys)
    new GenericArrayData(keys)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size())
    bb.putInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.put(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

object MisraGries {
  /** `misraGries64(h, k)` over 60-bit key hashes → sorted array<long>
    * of candidate heavy-hitter hashes (pair with
    * [[HashFunctions.md5prefix64]]).
    */
  def misraGries64(c: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expression(c), k).toAggregateExpression())
}
