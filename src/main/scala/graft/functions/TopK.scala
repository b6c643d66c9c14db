package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

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
  * Ordering is total and deterministic: score DESC, id ASC on ties — so the
  * result is reproducible and SQL-oracle-able (`row_number` twin). NULL
  * score/id rows can't rank and are skipped (SQL window functions order
  * NULLs arbitrarily across engines; excluding them is the deterministic
  * choice). Output: `array<struct<score double, id bigint>>`, best first.
  */
@ExpressionDescription(usage = "bounded top-k (score, id) pairs per group")
final case class TopKPairs(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[TopKBuffer] {

  require(k >= 1 && k <= (1 << 20), s"k=$k out of range (1..1048576 — state is k pairs per group)")

  // input typing: the Column wrapper casts score -> double, id -> long
  // (AbstractDataType / ImplicitCastInputTypes are private[sql] in Spark 4)
  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) buffer.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) { buffer.offer(other.scores(i), other.ids(i)); i += 1 }
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val rows = buffer.sortedBestFirst.map { case (s, i) => InternalRow(s, i) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buffer.size * 16)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) { bb.putDouble(buffer.scores(i)); bb.putLong(buffer.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.offer(bb.getDouble, bb.getLong); i += 1 }
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

/** Bounded min-heap of (score, id) pairs holding the CURRENT best k: the
  * root is the worst retained pair (score ASC, id DESC — the inverse of the
  * output order), so a better candidate replaces it in O(log k). Primitive
  * arrays, no boxing on the per-row hot path.
  */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  // a is WORSE than b in retained order (kicked out first)
  @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
    sa < sb || (sa == sb && ia > ib)

  def offer(s: Double, i: Long): Unit = {
    if (size < k) {
      var c = size
      scores(c) = s; ids(c) = i
      size += 1
      while (c > 0 && worse(scores(c), ids(c), scores((c - 1) / 2), ids((c - 1) / 2))) {
        swap(c, (c - 1) / 2); c = (c - 1) / 2
      }
    } else if (worse(scores(0), ids(0), s, i)) {
      scores(0) = s; ids(0) = i
      var c = 0
      var done = false
      while (!done) {
        val l = 2 * c + 1; val r = 2 * c + 2
        var m = c
        if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
        if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
        if (m == c) done = true
        else { swap(c, m); c = m }
      }
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  /** Best first: score DESC, id ASC. */
  def sortedBestFirst: Array[(Double, Long)] =
    (0 until size).map(i => (scores(i), ids(i))).toArray
      .sortBy { case (s, i) => (-s, i) }
}

object TopK {
  /** `topK(score, id, k)` as a Column — usable in any groupBy().agg(...). */
  def topK(score: Column, id: Column, k: Int): Column =
    org.apache.spark.sql.GraftExpr.column(
      TopKPairs(org.apache.spark.sql.GraftExpr.expr(score.cast("double")),
        org.apache.spark.sql.GraftExpr.expr(id.cast("long")), k).toAggregateExpression())
}
