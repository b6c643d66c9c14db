package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}
import graft.operators.TopKHeap

/** Bounded per-group TOP-K as a custom Catalyst aggregate — step (b) of the
  * custom-operator ladder (a native `TypedImperativeAggregate`, not a UDAF).
  *
  * "Best k rows per key" is usually written either as a per-key window
  * (`row_number over (partition by key order by score desc) <= k`) — which
  * serializes each key into ONE task, the power-law scale-killer — or as
  * `slice(sort_array(collect_list(...)))` — whose aggregation state is the
  * WHOLE group (a hot key OOMs the executor). This aggregate keeps state
  * bounded at k pairs per group at every stage: partial aggregation combines
  * map-side (each task's buffer holds at most k), partials merge
  * associatively, and the shuffle carries at most k pairs per (key,
  * partition) — the same plan shape as a sum, with hot keys costing no more
  * than cold ones.
  *
  * The buffer IS the ANN paths' `TopKHeap` (operators/Similarity.scala) —
  * ONE heap algebra in the engine: total order via `Double.compare` (NaN
  * ranks greatest, exactly how Spark and DuckDB order NaN in a DESC sort;
  * -0.0 normalized on insert), id ASC on ties — so the result is
  * reproducible and SQL-oracle-able (`row_number` twin). NULL score/id rows
  * can't rank and are skipped (SQL window functions order NULLs arbitrarily
  * across engines; excluding them is the deterministic choice). Output:
  * `array<struct<score double, id bigint>>`, best first.
  */
@ExpressionDescription(usage = "bounded top-k (score, id) pairs per group")
final case class TopKPairs(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[TopKHeap] {

  require(k >= 1 && k <= (1 << 20), s"k=$k out of range (1..1048576 — state is k pairs per group)")

  // input typing: the Column wrapper casts score -> double, id -> long
  // (AbstractDataType / ImplicitCastInputTypes are private[sql] in Spark 4)
  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) buffer.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.size) { buffer.add(other.simAt(i), other.idAt(i)); i += 1 }
    buffer
  }

  override def eval(buffer: TopKHeap): Any = {
    // best first: score DESC under the same total order the heap uses
    // (Double.compare — NaN greatest), id ASC on ties
    val rows = (0 until buffer.size).map(i => (buffer.simAt(i), buffer.idAt(i)))
      .sortWith { case ((sa, ia), (sb, ib)) =>
        val c = java.lang.Double.compare(sa, sb)
        c > 0 || (c == 0 && ia < ib)
      }
      .map { case (s, i) => InternalRow(s, i) }.toArray
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buffer.size * 16)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) { bb.putDouble(buffer.simAt(i)); bb.putLong(buffer.idAt(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKHeap(k)
    var i = 0
    while (i < n) { buf.add(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(score = newChildren(0), id = newChildren(1))
  override def prettyName: String = "graft_topk"
}

object TopK {
  /** `topK(score, id, k)` as a Column — usable in any groupBy().agg(...). */
  def topK(score: Column, id: Column, k: Int): Column =
    org.apache.spark.sql.GraftExpr.column(
      TopKPairs(org.apache.spark.sql.GraftExpr.expr(score.cast("double")),
        org.apache.spark.sql.GraftExpr.expr(id.cast("long")), k).toAggregateExpression())
}
