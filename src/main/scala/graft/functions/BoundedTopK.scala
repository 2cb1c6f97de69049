package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded per-group top-k aggregate backing `$topN/$bottomN/$top/$bottom`.
  *
  * Input is `struct(k0..km-1, output)`; the aggregate keeps AT MOST n
  * rows per group in a size-capped heap and emits the output values in
  * sortBy order. This is the 100 TB-safe form of the accumulator: a
  * collect_list-then-slice formulation materializes every group member
  * in executor memory (the whole fact table for low-cardinality groups)
  * where this buffer is O(n) regardless of group size, and map-side
  * partial aggregation ships at most n rows per group per task.
  *
  * Sort semantics match Mongo's sortBy (dirs(i) = ascending for key i;
  * nulls first ascending, last descending); `wantHead` picks the head
  * (top*) or tail (bottom*) slice of that order. When rows tie on the
  * FULL key beyond the cap, which of the tied rows survive is
  * unspecified (heap order among equals) — parity queries use a unique
  * tiebreak key per the oracle conventions in QueryDef.
  */
case class BoundedTopK(
    child: Expression,
    nExpr: Expression,
    headExpr: Expression,
    dirsExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[InternalRow]] {

  private lazy val n: Int = nExpr.eval().asInstanceOf[Int]
  private lazy val wantHead: Boolean = headExpr.eval().asInstanceOf[Boolean]
  private lazy val dirs: Array[Boolean] =
    dirsExpr.eval().toString.split(",").map(_ == "1")

  private lazy val structType = child.dataType.asInstanceOf[StructType]
  private lazy val numKeys = structType.size - 1
  private lazy val keyTypes = structType.fields.take(numKeys).map(_.dataType)
  private lazy val keyOrds = keyTypes.map(TypeUtils.getInterpretedOrdering)
  private lazy val outField = structType.fields.last

  override def children: Seq[Expression] = Seq(child, nExpr, headExpr, dirsExpr)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(outField.dataType, containsNull = outField.nullable)

  /** sortBy comparison: negative when a precedes b. */
  private def cmp(a: InternalRow, b: InternalRow): Int = {
    var i = 0
    while (i < numKeys) {
      val asc = dirs(i)
      val an = a.isNullAt(i); val bn = b.isNullAt(i)
      if (an || bn) {
        if (!an || !bn) // nulls first ascending, last descending
          return if (an) (if (asc) -1 else 1) else (if (asc) 1 else -1)
      } else {
        val c = keyOrds(i).compare(a.get(i, keyTypes(i)), b.get(i, keyTypes(i)))
        if (c != 0) return if (asc) c else -c
      }
      i += 1
    }
    0
  }

  // heap keeps the n best; its head is the WORST kept element so a new
  // candidate only displaces it when strictly better
  private def worstFirst: java.util.Comparator[InternalRow] =
    if (wantHead) (a: InternalRow, b: InternalRow) => cmp(b, a)
    else (a: InternalRow, b: InternalRow) => cmp(a, b)

  /** a strictly beats the currently-worst b for the kept set. */
  private def beats(a: InternalRow, b: InternalRow): Boolean =
    if (wantHead) cmp(a, b) < 0 else cmp(a, b) > 0

  override def createAggregationBuffer(): java.util.PriorityQueue[InternalRow] =
    new java.util.PriorityQueue[InternalRow](math.max(n, 1), worstFirst)

  private def add(buf: java.util.PriorityQueue[InternalRow], row: InternalRow): Unit = {
    if (n <= 0) () // degenerate cap: keep nothing (callers validate n >= 1)
    else if (buf.size < n) buf.offer(row)
    else if (beats(row, buf.peek())) { buf.poll(); buf.offer(row) }
  }

  override def update(buf: java.util.PriorityQueue[InternalRow],
                      input: InternalRow): java.util.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[InternalRow].copy())
    buf
  }

  override def merge(a: java.util.PriorityQueue[InternalRow],
                     b: java.util.PriorityQueue[InternalRow]): java.util.PriorityQueue[InternalRow] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  override def eval(buf: java.util.PriorityQueue[InternalRow]): Any = {
    val rows = new Array[InternalRow](buf.size)
    buf.toArray(rows)
    java.util.Arrays.sort(rows, (a: InternalRow, b: InternalRow) => cmp(a, b))
    new GenericArrayData(rows.map(r =>
      if (r.isNullAt(numKeys)) null else r.get(numKeys, outField.dataType)))
  }

  // per-expression-instance: serialize runs once per group at map-output
  // time, so projection creation must not be per-call
  @transient private lazy val proj = UnsafeProjection.create(structType)

  override def serialize(buf: java.util.PriorityQueue[InternalRow]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val bytes = proj(it.next()).getBytes
      dos.writeInt(bytes.length)
      dos.write(bytes)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[InternalRow] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val count = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < count) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val row = new UnsafeRow(structType.size)
      row.pointTo(b, len)
      buf.offer(row) // already capped at serialization time
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(child = newChildren(0), nExpr = newChildren(1),
      headExpr = newChildren(2), dirsExpr = newChildren(3))
}
