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
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Deterministic Bloom filter over 64-bit keys — the explicit spelling
  * of the runtime-filter / semi-join-reduction pattern (what ClickHouse
  * gets from `Set` indices and Spark's own `InjectRuntimeFilter` does
  * implicitly; cf. reference adsb_clickhouse's reliance on implicit
  * set-membership pruning): build a bitset over the build side's keys,
  * ship the ~KBs bitset to every probe task, and drop non-matching
  * probe rows AT THE SCAN, before any exchange. False positives are
  * removed by the exact join that follows; false negatives are
  * impossible — so a bloom-prefiltered semi/anti join is bit-exact
  * equal to the plain join while shuffling only the (tiny)
  * might-contain fraction of a 100 TB probe side.
  *
  * Everything is deterministic (splitmix64 double-hashing, fixed
  * seeds): the same key set yields the same bitset regardless of row
  * order or partitioning (set-bit OR is commutative), which the spec
  * pins by building under different partitionings.
  */
object BloomUtil {
  /** splitmix64 finalizer (Steele et al., public domain) — full
    * 64-bit avalanche; two fixed salts derive the double-hashing pair.
    */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private final val Salt2 = 0xA5A5A5A55A5A5A5AL

  /** Set the k positions of `v` in a power-of-two bitset (Kirsch–
    * Mitzenmacher double hashing: pos_i = h1 + i·h2 mod m).
    */
  def add(bits: Array[Long], numHashes: Int, v: Long): Unit = {
    val m = bits.length.toLong * 64L
    val h1 = mix64(v)
    val h2 = mix64(v ^ Salt2) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = (h1 + i.toLong * h2) & (m - 1L)
      bits((pos >>> 6).toInt) |= (1L << (pos & 63L))
      i += 1
    }
  }

  def mightContain(bits: Array[Long], numHashes: Int, v: Long): Boolean = {
    val m = bits.length.toLong * 64L
    val h1 = mix64(v)
    val h2 = mix64(v ^ Salt2) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = (h1 + i.toLong * h2) & (m - 1L)
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63L))) == 0L) return false
      i += 1
    }
    true
  }

  /** Wire format: [numHashes: int][numWords: int][words: long…]. */
  def serialize(bits: Array[Long], numHashes: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * bits.length)
    bb.putInt(numHashes).putInt(bits.length)
    var i = 0
    while (i < bits.length) { bb.putLong(bits(i)); i += 1 }
    bb.array()
  }

  /** Executable sizing rule: the smallest power-of-two bit count
    * giving ≥ `bitsPerKey` bits per expected key. At 10 bits/key with
    * 5 hashes the FPP is ~1 % ((1−e^(−5/10))⁵ ≈ 0.009); the pow2
    * ceiling only ever LOWERS it. Floor 1024 bits keeps tiny builds
    * honest; cap 2³⁰ bits = 128 MB bitset — past that (≥ ~10⁸ keys/
    * filter at 10 b/k) a single driver-shipped filter is the wrong
    * tool anyway (partition the build side instead). The fixed
    * default (1 << 20) the callers used to hard-code degrades to
    * ~100 % FPP at 10⁹ keys — still bit-correct (the exact join
    * cleans up) but silently useless: this rule replaces it.
    */
  def sizeFor(numKeys: Long, bitsPerKey: Int = 10): Int = {
    val want = math.max(1024L, numKeys * bitsPerKey.toLong)
    val capped = math.min(want, 1L << 30)
    java.lang.Long.highestOneBit(capped * 2L - 1L).toInt
  }

  def deserialize(bytes: Array[Byte]): BloomData = {
    val bb = ByteBuffer.wrap(bytes)
    val numHashes = bb.getInt
    val n = bb.getInt
    val bits = new Array[Long](n)
    var i = 0
    while (i < n) { bits(i) = bb.getLong; i += 1 }
    new BloomData(bits, numHashes)
  }
}

/** Deserialized filter — one instance per executor via codegen
  * reference objects, probed per row with zero allocation.
  */
final class BloomData(val bits: Array[Long], val numHashes: Int)
    extends Serializable {
  def mightContain(v: Long): Boolean =
    BloomUtil.mightContain(bits, numHashes, v)
}

/** Bitset-building aggregate: the buffer IS the long[] bitset, partial
  * buffers OR together map-side (ObjectHashAggregate — no sort), and
  * the shuffle moves one bitset per map task, never the keys. Output
  * is the serialized filter (BinaryType) — collected once at the
  * driver (a single ~KBs row, not a data collect) and re-shipped into
  * the probe-side scan as a literal, exactly how Spark's own runtime
  * filters materialize.
  */
case class BloomFilterAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
    s"numBits must be a power of two >= 64, got $numBits")
  require(numHashes >= 1 && numHashes <= 16,
    s"numHashes must be in [1,16], got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloomfilter64 input must be LONG (hash other types first), got ${child.dataType}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloomfilter64"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomUtil.add(buf, numHashes, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = BloomUtil.serialize(buf, numHashes)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomUtil.serialize(buf, numHashes)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomUtil.deserialize(bytes).bits

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomFilterAgg =
    copy(child = newChild)
}

/** Per-row membership probe against a driver-materialized filter. The
  * filter bytes ride in the expression (a literal after planning), are
  * deserialized ONCE per executor (codegen reference object / lazy
  * val), and the probe is a handful of word reads — cheap enough to
  * sit inside the scan's WholeStageCodegen filter.
  */
case class BloomMightContain(child: Expression, filter: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain input must be LONG, got ${child.dataType}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomData = BloomUtil.deserialize(filter)

  override def nullSafeEval(v: Any): Any = bloom.mightContain(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomData].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContain($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomFunctions {
  /** Aggregate Column building the serialized filter over a LONG key
    * column (hash strings with [[HashFunctions.md5prefix64]] first).
    */
  def bloomAgg(c: Column, numBits: Int, numHashes: Int): Column =
    ColumnBridge.column(
      BloomFilterAgg(ColumnBridge.expression(c), numBits, numHashes)
        .toAggregateExpression())

  /** Membership probe of a LONG column against serialized filter bytes. */
  def bloomMightContain(filter: Array[Byte], c: Column): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(c), filter))
}
