package graft.lime

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SP-LIME submodular pick (KDD 2016 §4, Algorithm 2).
  *
  * Greedily selects B instances maximizing coverage of global feature
  * importance I_j = sqrt(Σ_i |W_ij|). Each of the B rounds is one
  * small aggregation job over the explanation matrix DataFrame; driver
  * state is the covered-feature set and picked ids — O(B + d'), never
  * O(instances), so the loop scales to any instance count.
  */
object SpLime {

  /** @param explanations output of Lime.explainTabular / explainText:
    *   must contain (instance_id, feature-ish column, weight)
    * @return picked (round, instance_id, marginal_gain)
    */
  def pick(explanations: DataFrame, b: Int,
           featureCol: String = "feature"): Seq[(Int, Long, Double)] = {
    val w = explanations.select(
      col("instance_id"), col(featureCol).as("feature"), abs(col("weight")).as("aw"))
      .filter(col("aw") > 0)
      .cache()
    val importance = w.groupBy("feature").agg(sqrt(sum(col("aw"))).as("imp"))

    var covered = Set.empty[String]
    var picked = Vector.empty[(Int, Long, Double)]
    var round = 0
    while (round < b) {
      // Marginal gain = Σ importance over this instance's not-yet-covered
      // features; instances with zero gain stay pickable (Algorithm 2
      // selects exactly B instances).
      // One job per round: the winner's feature set rides along via
      // collect_set, so no second job is needed to update `covered`.
      val gains = w
        .filter(!col("instance_id").isin(picked.map(_._2): _*))
        .join(broadcast(importance), "feature")
        .groupBy("instance_id")
        .agg(
          sum(when(col("feature").isin(covered.toSeq: _*), 0.0)
            .otherwise(col("imp"))).as("gain"),
          collect_set(col("feature")).as("feats"))
        .orderBy(col("gain").desc, col("instance_id"))
        .limit(1)
        .collect()
      if (gains.isEmpty) round = b
      else {
        val g = gains(0)
        val id = g.getLong(0)
        picked :+= ((round, id, g.getDouble(1)))
        covered ++= g.getSeq[String](2)
        round += 1
      }
    }
    w.unpersist()
    picked
  }
}
