package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Prints the learned DOMAIN-classifier audit numbers behind qn112's
  * contract booleans (holdout top-1 accuracy vs chance, per the
  * fixture's class count) at a given fixture SF and label column — the
  * [[QualityModelAudit]] discipline applied to the multiclass model:
  * thresholds get set from measured margins, not hope. Also
  * cross-checks the primitive-loop serving expression against
  * `spark.ml`'s own `transform` argmax row-for-row (train/serve
  * layout-drift canary).
  *
  * Usage: `sbt 'runMain graft.tools.DomainModelAudit <sfDir> [labelCol] [dim] [iters]'`
  */
object DomainModelAudit {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: DomainModelAudit <sfDir> [labelCol] [dim] [iters]")
    val sfDir = args(0)
    val labelCol = if (args.length > 1) args(1) else "lang"
    val dim = if (args.length > 2) args(2).toInt else 512
    val iters = if (args.length > 3) args(3).toInt else 50
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", classOf[graft.hadoop.FastLocalFileSystem].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = graft.Tables.read(spark, sfDir, "documents")
    val train = d.where(pmod(col("doc_id"), lit(4)) =!= 1)
    val test = d.where(pmod(col("doc_id"), lit(4)) === 1)
    val t0 = System.nanoTime()
    val (model, mlModel) = TextOps.trainDomainModelWithMl(
      train, "text", labelCol, dim = dim, maxIter = iters)
    val trainSec = (System.nanoTime() - t0) / 1e9
    val k = model.numClasses
    // Serving-expression predictions on the holdout.
    val scored = test
      .select(col("doc_id"), col(labelCol).as("y"),
        TextOps.domainPredict(col("text"), model).as("p"))
      .select(col("doc_id"), col("y"),
        TextOps.domainLabel(col("p.pred"), model).as("yhat"),
        col("p.pred").as("pred"), col("p.prob"))
    // spark.ml transform on the same holdout, same featurization.
    import org.apache.spark.ml.functions.array_to_vector
    val mlPred = mlModel.transform(
      test.select(col("doc_id"),
        array_to_vector(TextOps.domainFeatures(
          col("text"), dim, model.charDim, model.charN)).as("features")))
      .select(col("doc_id"), col("prediction"))
    val agree = scored.join(mlPred, "doc_id")
      .agg(avg(when(col("pred").cast("double") === col("prediction"), 1d)
        .otherwise(0d)).as("agree")).head().getDouble(0)
    val r = scored.agg(
      count(lit(1)).as("n"),
      avg(when(col("y") === col("yhat"), 1d).otherwise(0d)).as("acc"),
      avg("prob").as("mean_prob")).head()
    println(f"""{"sf":"$sfDir","label":"$labelCol","dim":$dim,""" +
      f""""char_dim":${model.charDim},"char_n":${model.charN},"iters":$iters,""" +
      f""""k":$k,"train_sec":$trainSec%.2f,"n_test":${r.getLong(0)},""" +
      f""""acc":${r.getDouble(1)}%.4f,"chance":${1d / k}%.4f,""" +
      f""""acc_over_chance":${r.getDouble(1) * k}%.2f,""" +
      f""""mean_prob":${r.getDouble(2)}%.4f,"ml_agree":$agree%.4f}""")
    spark.stop()
  }
}
