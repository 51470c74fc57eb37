package graft
import org.apache.spark.sql.SparkSession

/** Shared SparkSession defaults for the engine mains.
  *
  * `coalescePartitions.minPartitionSize` is lowered from the 1 MB
  * default because several operators (all-pairs similarity, shingle
  * explodes) have tiny shuffle inputs that fan out to heavy CPU work —
  * AQE would coalesce them to a handful of partitions and serialize
  * the expensive stage. At real scale inputs are large and this
  * setting is inert.
  */
object Sessions {
  def local(cpus: String): SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .getOrCreate()
}
