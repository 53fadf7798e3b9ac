package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary with capacity k.
  *
  * Guarantees (Misra & Gries 1982; merge per Agarwal et al., "Mergeable
  * Summaries", PODS 2012): after summarizing n items — through any
  * sequence of inserts and merges — every item with true frequency
  * > n/(k+1) is PRESENT in the summary, and each stored count
  * undercounts its true frequency by at most n/(k+1).
  *
  * The summary is a SUPERSET bound, not an exact answer: the membership
  * set depends on partition/merge order. Exact uses must re-count the
  * candidates (see `TextAnalysis.heavyHitterTokens`), which is what makes
  * the end result deterministic and oracle-checkable.
  */
final class MgBuffer(val k: Int) {
  val counts = new java.util.HashMap[String, Long]()
  var n: Long = 0L // total items summarized (rides the buffer so callers get it for free)

  def insert(item: String): Unit = {
    n += 1
    val cur = counts.getOrDefault(item, 0L)
    if (cur > 0L) counts.put(item, cur + 1)
    else if (counts.size < k) counts.put(item, 1L)
    else decrementAll(1L)
  }

  /** Subtract d from every counter, dropping non-positive entries —
    * the O(size) cost is amortized O(1) per insert (every decrement is
    * paid for by a prior increment). */
  private def decrementAll(d: Long): Unit = {
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val v = e.getValue - d
      if (v <= 0L) it.remove() else e.setValue(v)
    }
  }

  /** Mergeable-summaries combine: add counts keywise; if over capacity,
    * subtract the (k+1)-th largest count from everything (keeps <= k
    * entries, preserves the n/(k+1) error bound). */
  def mergeFrom(other: MgBuffer): Unit = {
    n += other.n
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      counts.put(e.getKey, counts.getOrDefault(e.getKey, 0L) + e.getValue)
    }
    if (counts.size > k) {
      val vals = new Array[Long](counts.size)
      val vit = counts.values().iterator()
      var i = 0
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      decrementAll(vals(vals.length - k - 1)) // (k+1)-th largest
    }
  }
}

/** Aggregate form: `misra_gries(item, k)` returns
  * struct<n:bigint, items:array<struct<item:string, count_lb:bigint>>>
  * — n is the exact total item count, items the frequency summary sorted
  * by (count_lb desc, item asc). */
case class MisraGries(child: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] with UnaryLike[Expression] {

  require(k > 0 && k <= (1 << 22), s"misra_gries requires 0 < k <= 2^22, got $k")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"misra_gries requires a string item column, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count_lb", LongType, nullable = false))), containsNull = false),
      nullable = false)))

  override def nullable: Boolean = false

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buffer: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.insert(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: MgBuffer, other: MgBuffer): MgBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: MgBuffer): Any = {
    val entries = new Array[(String, Long)](buffer.counts.size)
    val it = buffer.counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val sorted = entries.sortBy(t => (-t._2, t._1))
    val arr = new Array[Any](sorted.length)
    i = 0
    while (i < sorted.length) {
      arr(i) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(sorted(i)._1), sorted(i)._2))
      i += 1
    }
    new GenericInternalRow(Array[Any](buffer.n, new GenericArrayData(arr)))
  }

  override def serialize(buffer: MgBuffer): Array[Byte] = {
    var bytes = 12 // n + size
    val it0 = buffer.counts.keySet().iterator()
    while (it0.hasNext) bytes += 12 + it0.next().getBytes(StandardCharsets.UTF_8).length
    val bb = ByteBuffer.allocate(bytes)
    bb.putLong(buffer.n)
    bb.putInt(buffer.counts.size)
    val it = buffer.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      bb.putInt(b.length)
      bb.put(b)
      bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new MgBuffer(k)
    buf.n = bb.getLong
    val size = bb.getInt
    var i = 0
    while (i < size) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.counts.put(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
  override def prettyName: String = "misra_gries"
}

object HeavyHitterFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def misraGries(item: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expression(item), k).toAggregateExpression())
}
