package org.apache.spark.sql.graft

import org.apache.spark.sql.types.{DataType, StructType}

/** Bridge into `StructType.merge` (`private[sql]`), so the store's
  * per-version schema sidecars union with EXACTLY the semantics
  * parquet's `mergeSchema` option uses (same method under the hood):
  * fields union by name, compatible types widen, conflicts throw.
  */
object SchemaBridge {
  def merge(a: StructType, b: StructType): StructType = a.merge(b)

  def fromJson(json: String): StructType =
    DataType.fromJson(json).asInstanceOf[StructType]
}
