package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded per-group top-k aggregate: `topk_structs(k, struct(...))` keeps
  * the k SMALLEST struct values under the struct's natural (field-order)
  * ordering and returns them as a sorted array.
  *
  * Why this exists: the built-in route to per-key top-k is either a window
  * (`row_number` over the full scored set — shuffles every candidate row)
  * or `slice(sort_array(collect_list(...)))` — which LOOKS bounded but is
  * not: collect_list's partial aggregation buffers the entire group
  * map-side, so the exchange still carries every row, just re-packaged
  * into lists. A `TypedImperativeAggregate` is the only way to make the
  * PARTIAL buffers bounded: each map-side buffer holds at most
  * `trimThreshold` (≤ 4k) rows, so the shuffle for a top-k over N
  * candidate rows ships O(partitions · groups · k) rows instead of O(N) —
  * the difference between a broadcast-probe ANN pass surviving a
  * 1000-executor corpus and re-shuffling it (q185's plan).
  *
  * Determinism: ties must be broken by the caller inside the struct (the
  * suite's standard "unique id as last field" rule); the ordering is
  * Spark's interpreted struct ordering — field by field, ascending. For
  * "largest first" semantics, negate the leading numeric field (exact for
  * the integer micro-units the suite uses).
  */
case class TopKStructs(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[InternalRow]] {

  require(k > 0, s"topk_structs requires k > 0, got $k")

  // trim lazily: append is O(1), sort amortizes over k appends
  private val trimThreshold = math.max(k * 4, 64)

  @transient private lazy val ordering: Ordering[InternalRow] = {
    val ord = TypeUtils.getInterpretedOrdering(child.dataType)
    (a: InternalRow, b: InternalRow) => ord.compare(a, b)
  }

  @transient private lazy val structType = child.dataType.asInstanceOf[StructType]
  @transient private lazy val toUnsafe = UnsafeProjection.create(structType)

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StructType => TypeUtils.checkForOrderingExpr(child.dataType, prettyName)
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a struct input, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_structs"

  override def createAggregationBuffer(): ArrayBuffer[InternalRow] =
    new ArrayBuffer[InternalRow]

  private def trim(buf: ArrayBuffer[InternalRow]): ArrayBuffer[InternalRow] =
    if (buf.length <= k) buf
    else {
      val kept = buf.sorted(ordering).take(k)
      buf.clear()
      buf ++= kept
    }

  override def update(
      buf: ArrayBuffer[InternalRow], input: InternalRow): ArrayBuffer[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      // incoming rows are reused by the caller — copy before retaining
      buf += v.asInstanceOf[InternalRow].copy()
      if (buf.length >= trimThreshold) trim(buf)
    }
    buf
  }

  override def merge(
      buf: ArrayBuffer[InternalRow],
      other: ArrayBuffer[InternalRow]): ArrayBuffer[InternalRow] = {
    buf ++= other
    trim(buf)
  }

  override def eval(buf: ArrayBuffer[InternalRow]): Any =
    new GenericArrayData(trim(buf).sorted(ordering).toArray[Any])

  override def serialize(buf: ArrayBuffer[InternalRow]): Array[Byte] = {
    val trimmed = trim(buf)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(trimmed.length)
    trimmed.foreach { row =>
      val u = toUnsafe(row)
      val bytes = u.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[InternalRow] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[InternalRow](n)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(structType.size)
      row.pointTo(rowBytes, len)
      buf += row
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStructs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStructs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKStructs =
    copy(child = newChildren.head)
}
