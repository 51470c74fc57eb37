package graft.lime

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bridge from an MLlib model to the LIME `scoreFn` hook.
  *
  * Wraps any `Transformer` (e.g. a fitted `PipelineModel` or
  * classifier): the perturbed frame's `f__val` columns are swapped in
  * as the model's input features, the model's `.transform` runs
  * distributed over the exploded sample frame (no driver round-trip,
  * no per-row model invocation), and the requested output column
  * becomes `pred`. Original feature columns are restored afterwards so
  * the LIME tail sees the instance values.
  */
object LimeMllib {

  /** @param model fitted transformer expecting `featuresCol`
    * @param features the LIME feature columns (perturbed as `f__val`)
    * @param probabilityIndex index into the probability vector for the
    *   positive class (classifiers); None = use the raw `prediction`
    *   column (regressors)
    */
  def scoreFn(
      model: Transformer,
      features: Seq[String],
      featuresCol: String = "features",
      probabilityIndex: Option[Int] = Some(1)): DataFrame => DataFrame = { df =>
    val stashed = features.foldLeft(df)((d, f) =>
      d.withColumn(s"${f}__orig", col(f)).withColumn(f, col(s"${f}__val")))
    val assembled = new VectorAssembler()
      .setInputCols(features.toArray).setOutputCol(featuresCol)
      .transform(stashed.drop(featuresCol))
    val scored = model.transform(assembled)
    val withPred = probabilityIndex match {
      case Some(i) => scored.withColumn("pred",
        element_at(vector_to_array(col("probability")), i + 1))
      case None => scored.withColumn("pred", col("prediction").cast("double"))
    }
    features.foldLeft(withPred)((d, f) =>
      d.withColumn(f, col(s"${f}__orig")).drop(s"${f}__orig"))
      .drop(featuresCol, "rawPrediction", "probability", "prediction")
  }
}
