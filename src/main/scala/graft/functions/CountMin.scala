package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Deterministic Count-Min sketch over 64-bit keys (Cormode &
  * Muthukrishnan 2005) — the OVERCOUNT-guarantee companion to the
  * Misra-Gries aggregate (K21, undercount-bounded): estimate(v) =
  * min over rows of counter[row][hash_row(v) mod width] is ALWAYS ≥
  * the true count (counters only ever add), so a CMS screen at
  * threshold T has no false negatives — screen + exact-verify ≡ the
  * exact heavy-hitter query, the same composition e25b proves for MG
  * from the other side of the guarantee.
  *
  * Unlike MG, the CMS state itself is ORDER-INDEPENDENT: the counter
  * matrix is a sum over per-row increments, and sums commute — the
  * same multiset of keys yields the BYTE-IDENTICAL sketch under any
  * partitioning or merge order (spec-pinned). Hashing is the bloom
  * family's fixed-seed splitmix64 double hashing, so the sketch is
  * also rerun-deterministic and, in principle, SQL-replayable cell
  * by cell.
  *
  * Scale shape: the aggregation buffer IS the long[depth·width]
  * matrix; partials sum map-side (ObjectHashAggregate) and the
  * shuffle moves one ~KBs matrix per map task, never the keys —
  * exactly the K17 bloom shape with counters instead of bits.
  */
object CmsUtil {
  private final val Salt2 = 0xC3C3C3C33C3C3C3CL

  /** Per-row cell index (Kirsch–Mitzenmacher double hashing over the
    * splitmix64 pair; width must be a power of two).
    */
  def cell(row: Int, width: Int, v: Long): Int = {
    val h1 = BloomUtil.mix64(v)
    val h2 = BloomUtil.mix64(v ^ Salt2) | 1L
    ((h1 + row.toLong * h2) & (width - 1L)).toInt
  }

  def add(m: Array[Long], depth: Int, width: Int, v: Long): Unit = {
    var r = 0
    while (r < depth) { m(r * width + cell(r, width, v)) += 1L; r += 1 }
  }

  def estimate(m: Array[Long], depth: Int, width: Int, v: Long): Long = {
    var est = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = m(r * width + cell(r, width, v))
      if (c < est) est = c
      r += 1
    }
    est
  }

  /** Wire format: [depth: int][width: int][counters: long…]. */
  def serialize(m: Array[Long], depth: Int, width: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * m.length)
    bb.putInt(depth).putInt(width)
    var i = 0
    while (i < m.length) { bb.putLong(m(i)); i += 1 }
    bb.array()
  }

  /** Fold a sketch down to a narrower power-of-two width — BIT-EXACT
    * equal to aggregating at `newWidth` directly, with zero extra
    * corpus scans: the cell index is `(h1 + r·h2) & (width−1)`, and
    * power-of-two masks NEST (`x & (W−1) & (W'−1) = x & (W'−1)` when
    * W' | W), so every increment that landed in cell c at width W
    * belongs in cell `c & (W'−1)` at width W' — counter groups
    * congruent mod W' sum down. The e25d sizing instrument uses this
    * to price all its operating points from ONE finest sketch
    * (driver-side arithmetic on the ~KBs matrix; spec-pinned fold ≡
    * direct in CmsSpec).
    */
  def foldWidth(bytes: Array[Byte], newWidth: Int): Array[Byte] = {
    val d = deserialize(bytes)
    require(newWidth >= 64 && (newWidth & (newWidth - 1)) == 0 &&
      d.width % newWidth == 0,
      s"newWidth must be a power of two >= 64 dividing ${d.width}, got $newWidth")
    val m = new Array[Long](d.depth * newWidth)
    var r = 0
    while (r < d.depth) {
      var c = 0
      while (c < d.width) {
        m(r * newWidth + (c & (newWidth - 1))) += d.m(r * d.width + c)
        c += 1
      }
      r += 1
    }
    serialize(m, d.depth, newWidth)
  }

  /** Merge two serialized sketches by counter addition — the
    * mergeable-summaries property at the WIRE level (J22's
    * merge-on-read): byte-identical to aggregating both inputs'
    * key streams into one sketch, because the matrix is a sum of
    * per-key increments and sums commute.
    */
  def mergeBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val da = deserialize(a)
    val db = deserialize(b)
    require(da.depth == db.depth && da.width == db.width,
      s"sketch dims differ: ${da.depth}x${da.width} vs ${db.depth}x${db.width}")
    val m = new Array[Long](da.m.length)
    var i = 0
    while (i < m.length) { m(i) = da.m(i) + db.m(i); i += 1 }
    serialize(m, da.depth, da.width)
  }

  def deserialize(bytes: Array[Byte]): CmsData = {
    val bb = ByteBuffer.wrap(bytes)
    val depth = bb.getInt
    val width = bb.getInt
    val m = new Array[Long](depth * width)
    var i = 0
    while (i < m.length) { m(i) = bb.getLong; i += 1 }
    new CmsData(m, depth, width)
  }
}

/** Deserialized sketch — one instance per executor via codegen
  * reference objects, probed per row with zero allocation.
  */
final class CmsData(val m: Array[Long], val depth: Int, val width: Int)
    extends Serializable {
  def estimate(v: Long): Long = CmsUtil.estimate(m, depth, width, v)
}

/** Matrix-building aggregate: buffer IS the counter matrix, partials
  * SUM map-side, output is the serialized sketch (BinaryType) —
  * collected once at the driver (one ~KBs row) and re-shipped into
  * probe expressions as a literal, the K17 bloom pattern.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
  require(width >= 64 && (width & (width - 1)) == 0,
    s"width must be a power of two >= 64, got $width")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"countmin64 input must be LONG (hash other types first), got ${child.dataType}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "countmin64"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) CmsUtil.add(buf, depth, width, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = CmsUtil.serialize(buf, depth, width)

  override def serialize(buf: Array[Long]): Array[Byte] =
    CmsUtil.serialize(buf, depth, width)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    CmsUtil.deserialize(bytes).m

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
}

/** Per-row frequency estimate against a driver-materialized sketch —
  * deserialized once per executor, min-of-depth word reads per row,
  * codegen-friendly inside the scan stage.
  */
case class CmsEstimate(child: Expression, sketch: Array[Byte])
    extends UnaryExpression {

  // Array params compare by reference in case-class equals; without
  // structural equality two identical probe expressions never satisfy
  // semanticEquals, defeating canonicalization / CSE / plan caching.
  override def equals(other: Any): Boolean = other match {
    case that: CmsEstimate =>
      child == that.child && java.util.Arrays.equals(sketch, that.sketch)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(sketch)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_estimate input must be LONG, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  @transient private lazy val cms: CmsData = CmsUtil.deserialize(sketch)

  override def nullSafeEval(v: Any): Any = cms.estimate(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cms", cms, classOf[CmsData].getName)
    defineCodeGen(ctx, ev, c => s"$ref.estimate($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)
}

object CmsFunctions {
  /** Aggregate Column building the serialized sketch over a LONG key
    * column (hash strings with [[HashFunctions.md5prefix64]] first).
    */
  def cmsAgg(c: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(
      CountMinAgg(ColumnBridge.expression(c), depth, width)
        .toAggregateExpression())

  /** Frequency estimate of a LONG column against serialized sketch bytes. */
  def cmsEstimate(sketch: Array[Byte], c: Column): Column =
    ColumnBridge.column(CmsEstimate(ColumnBridge.expression(c), sketch))
}
