package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact top-k by score as a typed imperative aggregate — the UDAF case
  * SURVEY.md §2.3 reserves for "exact top-k-by-similarity".
  *
  * Buffer = bounded list of (score, id), kept sorted worst-first and
  * capped at k: a losing row costs one primitive compare against the
  * current worst and ZERO allocation; a genuine improvement shifts into
  * place in O(k) (no tuple boxing, no re-sort — the r11 trim-storm fix;
  * ordering is (score desc, id asc) best-first at output).
  * Because this is an aggregate, Catalyst runs it map-side first: each
  * partition ships at most k candidates to the final aggregation instead
  * of the whole scored corpus through a sort — the difference between an
  * O(|corpus|) and an O(partitions·k) shuffle in brute-force similarity
  * search.
  *
  * Output: array<struct<sim double, vec_id long>> sorted best-first.
  */
case class TopKByScoreAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]]
  with ImplicitCastInputTypes {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("sim", DoubleType, nullable = false),
      StructField("vec_id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_by_score"

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Keep `buf` ASCENDING by quality (worst at index 0) and capped at
    * k, so a losing candidate costs ONE primitive compare against the
    * worst and ZERO allocation. This is the property that matters when
    * billions of candidate rows stream through hundreds of thousands of
    * group buffers (the routed-ANN 2M shape): the previous
    * append-then-trim re-SORTED the buffer every k updates — at k = 1,
    * a sortWith allocation storm every OTHER row — which made the
    * aggregate the dominant GC source of the stage and its wall a
    * GC/JIT lottery across JVMs. Insertions (O(k) shift) happen only on
    * genuine top-k improvements — O(k·log n) expected total per buffer.
    */
  private def insertOne(buf: ArrayBuffer[(Double, Long)], s: Double, i: Long): Unit = {
    if (buf.length >= k) {
      val w = buf(0)
      if (s < w._1 || (s == w._1 && i >= w._2)) return // not better than worst
      buf.remove(0)
    }
    val v = (s, i)
    var idx = 0
    while (idx < buf.length && !better(buf(idx), v)) idx += 1
    buf.insert(idx, v)
  }

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  /** (score, id) evaluated through a CODE-GENERATED UnsafeProjection,
    * not `score.eval(input)`: a TypedImperativeAggregate's children run
    * on the interpreted eval path by construction (CollapseProject
    * re-inlines any pre-projected score column into the Aggregate, so
    * callers cannot fix this from outside), and for the routed-ANN
    * shapes the score is the candidate dot product over ~1e9 rows —
    * r11 measured the same solo run 27 s vs 141 s depending on how
    * HotSpot's profile-driven inlining landed in the megamorphic
    * `BinaryExpression.eval` tree (the r10 probeAssign lottery, one
    * layer down). The generated projection is one monomorphic call per
    * row into compiled bytecode, writes into a reused row (zero
    * allocation, no boxing), and falls back to interpreted eval only
    * if codegen fails. ThreadLocal because generated projections carry
    * a reused result buffer and are not thread-safe.
    */
  @transient private lazy val inputProj =
    new ThreadLocal[org.apache.spark.sql.catalyst.expressions.UnsafeProjection] {
      override def initialValue(): org.apache.spark.sql.catalyst.expressions.UnsafeProjection =
        org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(Seq(score, id))
    }

  override def update(
      buf: ArrayBuffer[(Double, Long)], input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val row = inputProj.get()(input)
    if (!row.isNullAt(0) && !row.isNullAt(1)) {
      val s = row.getDouble(0)
      // A NaN score fails EVERY ordered compare, so insertOne would
      // evict the current worst and park the entry as best-ranked —
      // silent top-k corruption. NaN means "no meaningful score"
      // (0/0-normalized vectors and the like): drop it like a null.
      if (!java.lang.Double.isNaN(s)) insertOne(buf, s, row.getLong(1))
    }
    buf
  }

  override def merge(
      buf: ArrayBuffer[(Double, Long)],
      other: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    other.foreach { case (s, i) => insertOne(buf, s, i) }
    buf
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any = {
    val best = buf.sortWith(better).take(k)
    new GenericArrayData(best.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    // insertOne keeps every buffer <= k by construction; no trim needed.
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.length)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < n) { buf += ((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScoreAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScoreAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}
