package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew mitigation for shuffle joins on hot keys.
  *
  * AQE's skew-join handling (on by default) splits oversized sort-merge
  * partitions at runtime; salting is the plan-level fallback when a single
  * key is so hot that even split partitions bottleneck (the classic
  * power-law user_id at 100 TB). `saltedJoin` replicates the build side
  * `saltFactor`× and scatters the probe side uniformly, so one hot key
  * spreads over `saltFactor` reducers at the cost of an extra tiny column.
  */
object SkewTools {

  /** Inner equi-join with the probe side salted across `saltFactor`
    * partitions per key. `left` is the large/skewed probe side; `right`
    * (the build side) is replicated `saltFactor`×.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      saltFactor: Int): DataFrame = {

    require(saltFactor > 1, "saltFactor must be > 1")
    // Deterministic scatter: hash of (full row, per-partition row counter)
    // modulo saltFactor. The counter spreads fully identical duplicate
    // rows (the common hot-key shape in event data) across salt buckets —
    // a row-content hash alone would send all copies to one reducer and
    // keep the skew. monotonically_increasing_id is deterministic under
    // task retry for a stable input partitioning, unlike rand(), so a
    // retried task re-salts its rows identically.
    val salted = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col) :+ monotonically_increasing_id(): _*)),
        lit(saltFactor)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated,
        salted(leftKey) === replicated(rightKey) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
