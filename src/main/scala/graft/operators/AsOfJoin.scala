package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** As-of join (pandas `merge_asof` parity — SURVEY.md §2.3 "Joins"):
  * for each left row, attach the payload of the single right row with the
  * greatest `rightTs <= leftTs` ([[backward]]), the smallest
  * `rightTs >= leftTs` ([[forward]]), or whichever of the two is closer in
  * time ([[nearest]], ties to backward — pandas semantics), within the
  * same join key(s). An optional `tolerance` (seconds for timestamp
  * columns; plain units for numeric ts) nulls out matches further away
  * than the bound, like pandas' `Timedelta` tolerance.
  *
  * Spark has no built-in as-of join, and the naive formulation
  * (range join + per-left-row argmax) explodes to |L|×|R| intermediate
  * rows per key. This implementation uses the union + edge-value trick:
  * tag both sides, union them, and for each left row take the last
  * (backward) / first (forward) non-null right payload over a window
  * ordered by (ts, side). One shuffle on the join keys, O(|L|+|R|) rows
  * total, no explosion — the shape that survives 100 TB (each key's
  * timeline is processed as one sorted run; for mega-hot keys pass
  * `bucketWidth` to spread a single key's timeline over many window
  * partitions with carry-row boundary stitching — see [[bucketed]]).
  * [[nearest]] computes both directions over the same union: still one
  * shuffle, two local sorts.
  *
  * Ties: an exactly-simultaneous right row IS visible to the left row in
  * every direction. If several right rows share (keys, ts), backward
  * takes the one last in `tieBreak` order and forward the one first —
  * pass a unique column for determinism.
  */
object AsOfJoin {

  private val SideCol = "__asof_side"
  private val TsCol = "__asof_ts"
  private val PayloadCol = "__asof_payload"
  private val MatchTs = "__asof_mts"
  private val BwdCol = "__asof_bwd"
  private val FwdCol = "__asof_fwd"
  private val BktCol = "__asof_bkt"
  private val OrdCol = "__asof_ord"

  /** Tag, union, and attach per-direction matched-payload columns.
    * Payload travels as ONE struct (with the matched ts riding along) so
    * the matched right row is taken atomically — per-column
    * last(ignoreNulls) would stitch together fields from different right
    * rows whenever the latest row holds a NULL in one payload column.
    *
    * With `bucketWidth` set (the mega-hot-key mitigation) the window
    * partitions by (keys, coarse time bucket) instead of keys alone, so
    * one power-law key's timeline spreads over many tasks; boundary
    * stitching is done with per-bucket carry rows — see [[bucketed]].
    */
  private def matched(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tieBreak: Option[String],
      needBackward: Boolean,
      needForward: Boolean,
      bucketWidth: Option[Double]): (DataFrame, Seq[String]) = {

    require(payload.nonEmpty, "payload must name at least one right column")
    val leftCols = left.columns.toSeq
    // A null-ts right row has no position on the timeline and can match
    // nothing (pandas merge_asof raises on null keys; dropping is the
    // lenient analog). Without the filter, nulls-first ASC ordering made
    // such rows the "earliest" — the backward match of every early left
    // row.
    val taggedRight = right.where(col(rightTs).isNotNull).select(
      (on.map(col) :+ col(rightTs).as(TsCol) :+ lit(0).as(SideCol)) :+
        struct(payload.map(c => col(c).as(c)) :+ col(rightTs).as(MatchTs): _*).as(PayloadCol): _*)
    val taggedLeft = left.select(
      (leftCols.map(col) :+ col(leftTs).as(TsCol) :+ lit(1).as(SideCol)): _*)

    val tie = tieBreak.map(c => col(PayloadCol).getField(c)).toSeq
    val (unioned, part, ord) = bucketWidth match {
      case None =>
        (taggedLeft.unionByName(taggedRight, allowMissingColumns = true),
          on.map(col), Seq.empty[Column])
      case Some(w) =>
        (bucketed(taggedLeft, taggedRight, on, tieBreak, needBackward, needForward,
            w, isTimestamp(left, leftTs)),
          on.map(col) :+ col(BktCol), Seq(col(OrdCol)))
    }
    // Backward: right (side 0) sorts before left at equal ts, so the
    // simultaneous right row falls inside the preceding frame. Carry rows
    // (ord -1/+1) sort strictly before/after every real row (ord 0).
    val wBack = Window.partitionBy(part: _*)
      .orderBy(ord ++ Seq(col(TsCol), col(SideCol)) ++ tie: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Forward: the ENTIRE ordering reversed, as a RUNNING frame. The
    // natural formulation — first(...) over (currentRow,
    // unboundedFollowing) in ascending order — is re-aggregated from
    // scratch per row by Spark's UnboundedFollowing frame: O(n²) per
    // window partition, quadratic on exactly the hot keys this operator
    // documents surviving. last(...) over (unboundedPreceding,
    // currentRow) in the reversed order is the same value via the O(n)
    // running frame. At equal ts the right row (side 0) sorts before the
    // left in the reversed order, so the simultaneous right row stays
    // visible.
    val wFwd = Window.partitionBy(part: _*)
      .orderBy(ord.map(_.desc) ++ Seq(col(TsCol).desc, col(SideCol)) ++ tie.map(_.desc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    var df = unioned
    if (needBackward)
      df = df.withColumn(BwdCol, last(col(PayloadCol), ignoreNulls = true).over(wBack))
    if (needForward)
      df = df.withColumn(FwdCol, last(col(PayloadCol), ignoreNulls = true).over(wFwd))
    // A null-ts LEFT row has no timeline position either: it sorts at an
    // arbitrary end of each window order (nulls first ASC / last DESC)
    // where a running frame would hand it a spurious "match". No match is
    // the only honest answer.
    Seq(BwdCol, FwdCol).filter(df.columns.contains).foreach { c =>
      df = df.withColumn(c, when(col(TsCol).isNull, lit(null)).otherwise(col(c)))
    }
    (df.where(col(SideCol) === 1), leftCols)
  }

  /** Coarse time-range pre-bucketing for mega-hot keys: rows land in
    * bucket floor(ts / width) and the as-of windows partition by
    * (keys, bucket), so one key that owns 90% of a 100 TB table's rows
    * is processed by timeline-span/width tasks instead of serializing
    * through a single window partition.
    *
    * Cross-boundary stitching: a left row's match may live in an earlier
    * (backward) or later (forward) bucket. For every (key, bucket) seen
    * on EITHER side, one synthetic carry row per needed direction is
    * injected:
    *   - backward carry = the last right row over all earlier buckets
    *     (running `last` over the per-bucket maxima, ordered by bucket),
    *     with ord −1 so it sorts before every real row in the bucket;
    *   - forward carry = the first right row over all later buckets,
    *     ord +1, sorting after every real row.
    * The carry computation runs on per-(key, bucket) AGGREGATED rows —
    * its key-only window moves one row per bucket, not per event, so the
    * hot key costs O(#buckets) there. Equal timestamps always share a
    * bucket (same floor), so tie semantics are untouched.
    */
  private def bucketed(
      taggedLeft: DataFrame,
      taggedRight: DataFrame,
      on: Seq[String],
      tieBreak: Option[String],
      needBackward: Boolean,
      needForward: Boolean,
      width: Double,
      timestampTs: Boolean): DataFrame = {

    require(width > 0, "bucketWidth must be > 0")
    val widthExact = if (timestampTs) width * 1e6 else width
    def bkt(c: Column): Column = floor(tsExact(c, timestampTs) / widthExact).cast("long")
    val leftB = taggedLeft.withColumn(BktCol, bkt(col(TsCol))).withColumn(OrdCol, lit(0))
    val rightB = taggedRight.withColumn(BktCol, bkt(col(TsCol))).withColumn(OrdCol, lit(0))

    // Within a bucket the backward match is the row LAST in (ts, tie)
    // order and the forward match the row FIRST in it — same ordering the
    // real windows use (side breaks no ties here: all rows are right
    // rows).
    val ordKey = struct(col(TsCol) +: tieBreak.map(c => col(PayloadCol).getField(c)).toSeq: _*)
    val inBucket = rightB.groupBy(on.map(col) :+ col(BktCol): _*)
      .agg(max_by(col(PayloadCol), ordKey).as("__last_in"),
        min_by(col(PayloadCol), ordKey).as("__first_in"))
    val keyCols = on :+ BktCol
    val allBuckets = leftB.select(keyCols.map(col): _*)
      .union(rightB.select(keyCols.map(col): _*))
      .distinct()
    val wPrev = Window.partitionBy(on.map(col): _*).orderBy(col(BktCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy(on.map(col): _*).orderBy(col(BktCol))
      .rowsBetween(1, Window.unboundedFollowing)
    val carrySrc = allBuckets.join(inBucket, keyCols, "left")
      .withColumn("__bwd_c", last(col("__last_in"), ignoreNulls = true).over(wPrev))
      .withColumn("__fwd_c", first(col("__first_in"), ignoreNulls = true).over(wNext))

    def carry(c: String, ordVal: Int): DataFrame =
      carrySrc.where(col(c).isNotNull).select(
        on.map(col) :+ col(BktCol) :+ lit(0).as(SideCol) :+
          lit(ordVal).as(OrdCol) :+ col(c).as(PayloadCol): _*)

    var u = leftB.unionByName(rightB, allowMissingColumns = true)
    if (needBackward)
      u = u.unionByName(carry("__bwd_c", -1), allowMissingColumns = true)
    if (needForward)
      u = u.unionByName(carry("__fwd_c", 1), allowMissingColumns = true)
    u
  }

  /** Exact numeric view of a ts value for gap arithmetic: integer
    * microseconds for timestamps (a double-epoch-seconds cast has
    * ~2.4e-7 s ulp at current epochs — enough to flip a boundary
    * tolerance or an equidistant nearest-tie against an exact-integer
    * oracle), plain double otherwise (exact for longs < 2^53).
    */
  private def tsExact(c: Column, timestampTs: Boolean): Column =
    if (timestampTs) unix_micros(c).cast("double") else c.cast("double")

  private def isTimestamp(df: DataFrame, tsCol: String): Boolean =
    df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampType => true
      case org.apache.spark.sql.types.TimestampNTZType => true
      case _ => false
    }

  /** Null out a matched payload further than `tolerance` from the left
    * ts. Tolerance is in seconds for timestamp ts columns (converted to
    * exact micros), plain ts units otherwise.
    */
  private def tolerated(p: Column, tol: Option[Double], forward: Boolean,
      timestampTs: Boolean): Column =
    tol match {
      case None => p
      case Some(t) =>
        val bound = if (timestampTs) t * 1e6 else t
        val gap =
          if (forward) tsExact(p.getField(MatchTs), timestampTs) - tsExact(col(TsCol), timestampTs)
          else tsExact(col(TsCol), timestampTs) - tsExact(p.getField(MatchTs), timestampTs)
        when(p.isNotNull && gap <= bound, p)
    }

  private def project(df: DataFrame, leftCols: Seq[String], payload: Seq[String],
      chosen: Column): DataFrame =
    df.select(leftCols.map(col) ++
      payload.map(c => chosen.getField(c).as(s"asof_$c")): _*)

  /** Latest right row at-or-before each left row.
    * @param bucketWidth coarse time-bucket width (seconds for timestamp
    *        ts columns, plain ts units otherwise) for the mega-hot-key
    *        mitigation — see [[bucketed]]. None (default) = one window
    *        partition per key.
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tieBreak: Option[String] = None,
      tolerance: Option[Double] = None,
      bucketWidth: Option[Double] = None): DataFrame = {
    val (df, leftCols) = matched(left, right, on, leftTs, rightTs, payload, tieBreak,
      needBackward = true, needForward = false, bucketWidth)
    project(df, leftCols, payload,
      tolerated(col(BwdCol), tolerance, forward = false, isTimestamp(left, leftTs)))
  }

  /** Earliest right row at-or-after each left row. */
  def forward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tieBreak: Option[String] = None,
      tolerance: Option[Double] = None,
      bucketWidth: Option[Double] = None): DataFrame = {
    val (df, leftCols) = matched(left, right, on, leftTs, rightTs, payload, tieBreak,
      needBackward = false, needForward = true, bucketWidth)
    project(df, leftCols, payload,
      tolerated(col(FwdCol), tolerance, forward = true, isTimestamp(left, leftTs)))
  }

  /** Closest right row in either direction; equidistant ties go backward
    * (pandas `direction="nearest"` semantics). One shuffle, two sorts.
    */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tieBreak: Option[String] = None,
      tolerance: Option[Double] = None,
      bucketWidth: Option[Double] = None): DataFrame = {
    val (df, leftCols) = matched(left, right, on, leftTs, rightTs, payload, tieBreak,
      needBackward = true, needForward = true, bucketWidth)
    val tsTs = isTimestamp(left, leftTs)
    val b = tolerated(col(BwdCol), tolerance, forward = false, tsTs)
    val f = tolerated(col(FwdCol), tolerance, forward = true, tsTs)
    val gapB = tsExact(col(TsCol), tsTs) - tsExact(b.getField(MatchTs), tsTs)
    val gapF = tsExact(f.getField(MatchTs), tsTs) - tsExact(col(TsCol), tsTs)
    val chosen = when(b.isNull, f)
      .when(f.isNull, b)
      .when(gapB <= gapF, b)
      .otherwise(f)
    project(df, leftCols, payload, chosen)
  }
}
