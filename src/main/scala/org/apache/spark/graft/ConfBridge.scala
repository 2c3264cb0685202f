package org.apache.spark.graft

import org.apache.hadoop.conf.Configuration
import org.apache.spark.SparkContext
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.util.SerializableConfiguration

/** `SerializableConfiguration`'s class is public but its constructor and
  * companion are `private[spark]` — this bridge (same pattern as the
  * `org.apache.spark.sql.graft` expression package) exposes the one
  * operation distributed file jobs need: ship the Hadoop conf to
  * executors once, as a broadcast.
  */
object ConfBridge {
  def broadcast(sc: SparkContext, conf: Configuration): Broadcast[SerializableConfiguration] =
    sc.broadcast(new SerializableConfiguration(conf))
}
