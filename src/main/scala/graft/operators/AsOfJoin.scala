package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** As-of join (pandas `merge_asof` parity — SURVEY.md §2.3 "Joins"):
  * for each left row, attach the payload of the single right row with the
  * greatest `rightTs <= leftTs` (backward direction) within the same join
  * key(s).
  *
  * Spark has no built-in as-of join, and the naive formulation
  * (range join + per-left-row argmax) explodes to |L|×|R| intermediate
  * rows per key. This implementation uses the union + last-value trick:
  * tag both sides, union them, and for each left row take the last
  * non-null right payload over a window ordered by (ts, side). One shuffle
  * on the join keys, O(|L|+|R|) rows total, no explosion — the shape that
  * survives 100 TB (each key's timeline is processed as one sorted run;
  * for mega-hot keys, pre-bucket by coarse time range first).
  *
  * Ties: right rows sort before left rows at equal timestamps, so an
  * exactly-simultaneous right row IS visible to the left row. If several
  * right rows share (keys, ts), the one last in `tieBreak` order wins —
  * pass a unique column for determinism.
  */
object AsOfJoin {

  private val SideCol = "__asof_side"
  private val TsCol = "__asof_ts"

  def backward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tieBreak: Option[String] = None): DataFrame = {

    require(payload.nonEmpty, "payload must name at least one right column")
    val leftCols = left.columns.toSeq
    val PayloadCol = "__asof_payload"

    // Payload travels as ONE struct so the matched right row is taken
    // atomically — per-column last(ignoreNulls) would stitch together
    // fields from different right rows whenever the latest row holds a
    // NULL in one payload column.
    val taggedRight = right.select(
      (on.map(col) :+ col(rightTs).as(TsCol) :+ lit(0).as(SideCol)) :+
        struct(payload.map(c => col(c).as(c)): _*).as(PayloadCol): _*)
    val taggedLeft = left.select(
      (leftCols.map(col) :+ col(leftTs).as(TsCol) :+ lit(1).as(SideCol)): _*)

    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)

    val orderCols: Seq[Column] =
      Seq(col(TsCol), col(SideCol)) ++
        tieBreak.map(c => col(PayloadCol).getField(c)).toSeq
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned
      .withColumn(PayloadCol, last(col(PayloadCol), ignoreNulls = true).over(w))
      .where(col(SideCol) === 1)
      .select(leftCols.map(col) ++
        payload.map(c => col(PayloadCol).getField(c).as(s"asof_$c")): _*)
  }
}
