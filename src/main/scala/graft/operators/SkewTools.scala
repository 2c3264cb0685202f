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
    // Deterministic scatter: hash of (full row, source partition index)
    // modulo saltFactor. The partition index spreads fully identical
    // duplicate rows that span input partitions (the common hot-key shape
    // in event data) without sacrificing retry safety: a recomputed task
    // keeps its partition index, so it re-salts every row identically —
    // unlike rand() or monotonically_increasing_id(), whose values depend
    // on nondeterministic within-partition row order and can duplicate or
    // drop join rows when a map task is retried after a partial reducer
    // fetch. Identical duplicates WITHIN one input partition still share
    // a salt; if one partition holds a pathological duplicate run,
    // pre-aggregate (dedup with count, multiply after the join) instead.
    val salted = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col) :+ spark_partition_id(): _*)),
        lit(saltFactor)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated,
        salted(leftKey) === replicated(rightKey) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
