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
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "inputs must not carry a '__salt' column (reserved by saltedJoin)")
    // Deterministic scatter: hash of (hashable row columns, source
    // partition index) modulo saltFactor. The partition index spreads
    // fully identical duplicate rows that span input partitions (the
    // common hot-key shape in event data) without sacrificing retry
    // safety: a recomputed task keeps its partition index, so it
    // re-salts every row identically — unlike rand() or
    // monotonically_increasing_id(), whose values depend on
    // nondeterministic within-partition row order and can duplicate or
    // drop join rows when a map task is retried after a partial reducer
    // fetch. Identical duplicates WITHIN one input partition still share
    // a salt; if one partition holds a pathological duplicate run,
    // pre-aggregate (dedup with count, multiply after the join) instead.
    // Map-typed columns are excluded from the hash input (xxhash64
    // rejects MapType at analysis since Spark 3.0 — a properties map in
    // `left` would otherwise crash the helper).
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val hashCols = left.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
    val salted = left.withColumn("__salt",
      pmod(xxhash64(struct(hashCols.toSeq :+ spark_partition_id(): _*)),
        lit(saltFactor)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated,
        salted(leftKey) === replicated(rightKey) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
